package graft.api

/** Driver-side keyword extraction — the reference's stop-word pipeline
  * (`src/mcp/utils/stop-words.ts:222-301`): tokenize on the EN+JA
  * punctuation class, drop stop words (EN ∪ JA lists, stop-words.ts:
  * 8-214), filter by min length, count, filter by min frequency, order
  * by frequency descending (stable — ties keep first-occurrence order,
  * as a JS Map preserves insertion order under a stable sort).
  *
  * This runs on collected top-k pages (O(k) rows), never on the
  * corpus; the corpus-side keyword queries (`q_keyword_freq` etc.) use
  * the columnar pipeline in [[graft.operators.TextAnalysis]].
  */
object Keywords {

  /** stop-words.ts:8-166. */
  val English: Set[String] = Set(
    "a", "an", "the",
    "and", "or", "but", "nor", "yet", "so",
    "in", "on", "at", "to", "for", "of", "with", "by", "from", "about",
    "into", "through", "during", "before", "after", "above", "below",
    "between", "under", "over",
    "i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
    "us", "them", "my", "your", "his", "its", "our", "their", "this",
    "that", "these", "those",
    "is", "am", "are", "was", "were", "be", "been", "being", "have",
    "has", "had", "having", "do", "does", "did", "doing", "will",
    "would", "could", "should", "may", "might", "must", "shall", "can",
    "need", "dare", "ought", "used",
    "what", "which", "who", "whom", "whose", "when", "where", "why", "how",
    "not", "no", "too", "very", "just", "only", "quite", "now", "then",
    "once", "here", "there", "all", "any", "each", "few", "more", "most",
    "other", "some", "such", "both", "either", "neither", "many", "much",
    "another", "own", "same", "than", "up", "down", "out", "off",
    "again", "further", "also", "back", "well", "even", "still", "way",
    "because", "however", "if", "unless", "until", "while", "although",
    "though", "since", "as")

  /** stop-words.ts:171-209. */
  val Japanese: Set[String] = Set(
    "の", "に", "は", "を", "た", "が", "で", "て", "と", "し", "れ", "さ",
    "ある", "いる", "も", "する", "から", "な", "こと", "として", "い",
    "や", "など", "なる", "へ", "か", "だ",
    "これ", "それ", "あれ", "この", "その", "あの",
    "です", "ます", "でした", "ました")

  val All: Set[String] = English ++ Japanese

  /** Corpus-side index exclusion list: the degenerate highest-df
    * determiners dropped before any (term, doc) artifact is built —
    * the columnar analogue of the reference's stop-word drop
    * (stop-words.ts:234-246) applied at index-build time rather than
    * per collected page. Declared here (a strict subset of
    * [[English]]) so the corpus operators and their DuckDB oracle
    * twins share one definition instead of magic literals; kept tiny
    * so oracle SQL stays hand-readable. Scale note: exclusion bounds
    * nothing by itself — the posting-list operators bound their
    * per-term work with `TopKAggregator` regardless, so an unlisted
    * hot term cannot pin a task. */
  val IndexExcluded: Seq[String] = Seq("the", "a")

  /** `'the','a'` — [[IndexExcluded]] rendered as a SQL literal list
    * for the oracle twins. */
  def indexExcludedSql: String = IndexExcluded.map(w => s"'$w'").mkString(",")

  /** The tokenizer separator class (stop-words.ts:228-232): whitespace,
    * ideographic space, ASCII + CJK punctuation. */
  private val Separators =
    "[\\s　,;.!?()\\[\\]{}:\"'。、！？「」『』（）【】〈〉《》〔〕［］｛｝・]+"

  /** Lowercased non-stop-word tokens, in text order. */
  def removeStopWords(text: String): Seq[String] =
    text.toLowerCase.split(Separators).toSeq
      .filter(w => w.nonEmpty && !All(w))

  /** Distinct keywords ordered by frequency desc (ties: first
    * occurrence first), after minLength/minFrequency filters —
    * `extractKeywords` with the reference defaults minLength=2,
    * minFrequency=1. */
  def extract(text: String, minLength: Int = 2, minFrequency: Int = 1,
      topN: Option[Int] = None): Seq[String] = {
    val words = removeStopWords(text).filter(_.length >= minLength)
    val freq = collection.mutable.LinkedHashMap.empty[String, Int]
    words.foreach(w => freq.update(w, freq.getOrElse(w, 0) + 1))
    val kept = freq.toSeq.filter(_._2 >= minFrequency)
      .sortBy(-_._2).map(_._1)
    topN.fold(kept)(kept.take)
  }
}
