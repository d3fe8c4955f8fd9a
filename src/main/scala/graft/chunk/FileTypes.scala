package graft.chunk

/** Extension classification + per-type chunk settings (reference S6/C5:
  * `src/core/chunk/file-extensions.ts:35-217`,
  * `src/core/chunk/chunk-optimizer.ts:14-88`). On executors this object
  * is a JVM-singleton lookup — no broadcast needed.
  */
object FileTypes {

  case class ChunkSettings(chunkSize: Int, chunkOverlap: Int)

  val CodeSettings = ChunkSettings(650, 125)
  val DocumentationSettings = ChunkSettings(1250, 250)
  val ArticleSettings = ChunkSettings(1750, 350)
  val DefaultSettings = ChunkSettings(1000, 200)

  val codeExtensions: Set[String] = Set(
    ".js", ".jsx", ".ts", ".tsx", ".py", ".java", ".cs", ".rb", ".go",
    ".rs", ".cpp", ".c", ".h")

  val markdownExtensions: Set[String] = Set(".md", ".mdx")

  val configExtensions: Set[String] = Set(".json", ".yaml", ".yml", ".toml")

  /** The indexability allow-list (S6). */
  val textExtensions: Set[String] = Set(
    ".txt", ".md", ".mdx",
    ".js", ".jsx", ".ts", ".tsx", ".mjs", ".mts", ".cjs",
    ".py", ".go", ".rs", ".java", ".rb", ".c", ".cpp", ".h",
    ".html", ".css", ".sass", ".scss", ".json", ".xml", ".xmlx",
    ".yaml", ".yml", ".toml", ".sh", ".bash", ".vue", ".svelte",
    ".example")

  val languageByExtension: Map[String, String] = Map(
    ".js" -> "javascript", ".jsx" -> "javascript", ".mjs" -> "javascript",
    ".cjs" -> "javascript", ".ts" -> "typescript", ".mts" -> "typescript",
    ".tsx" -> "tsx", ".py" -> "python", ".go" -> "go", ".rs" -> "rust",
    ".java" -> "java", ".rb" -> "ruby", ".c" -> "c", ".cpp" -> "cpp",
    ".h" -> "c", ".html" -> "html", ".css" -> "css", ".scss" -> "css",
    ".sass" -> "css", ".sh" -> "bash", ".bash" -> "bash", ".vue" -> "vue")

  private val settingsByExtension: Map[String, ChunkSettings] = {
    val code = (codeExtensions ++ configExtensions ++
      Set(".css", ".scss", ".sass", ".sh", ".bash", ".xml", ".xmlx",
        ".vue", ".svelte")).map(_ -> CodeSettings)
    val docs = (markdownExtensions + ".html").map(_ -> DocumentationSettings)
    (code ++ docs).toMap +
      (".txt" -> ArticleSettings) + (".example" -> DefaultSettings)
  }

  def extensionOf(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot <= 0) "" else base.substring(dot).toLowerCase
  }

  def isTextFile(path: String): Boolean =
    textExtensions.contains(extensionOf(path))

  def isCodeFile(ext: String): Boolean = codeExtensions.contains(ext.toLowerCase)

  def isMarkdownFile(ext: String): Boolean =
    markdownExtensions.contains(ext.toLowerCase)

  def languageFor(ext: String): String =
    languageByExtension.getOrElse(ext.toLowerCase, "javascript")

  /** C5: extension → optimal chunk settings. */
  def optimalSettings(path: String): ChunkSettings = {
    val ext = extensionOf(path)
    if (ext.isEmpty) DefaultSettings
    else settingsByExtension.getOrElse(ext, DefaultSettings)
  }
}

/** C6 dispatch: pick the chunker from the file path (reference
  * `src/core/chunk/chunking.ts:240-288`). Languages with a ported
  * structural inventory go through [[CstChunker]] (C4); any scan
  * failure falls back to the regex code chunker — the reference's own
  * any-failure fallback (`cst-operations.ts:148-190`). Languages
  * without an inventory use the regex chunker directly (the
  * reference's `chunkCodeByBoundary` fallback path).
  */
object ChunkDispatch {
  import graft.model.ChunkPiece

  def chunk(
      text: String,
      filePath: Option[String],
      size: Int = Chunker.DefaultSize,
      overlap: Int = Chunker.DefaultOverlap,
      preserveBoundaries: Boolean = false,
      preserveWords: Boolean = true): Seq[ChunkPiece] = {
    val ext = filePath.map(FileTypes.extensionOf).getOrElse("")
    if (preserveBoundaries && filePath.isDefined && FileTypes.isMarkdownFile(ext))
      MarkdownChunker.chunk(text, size, overlap)
    else if (preserveBoundaries && filePath.isDefined &&
        FileTypes.languageByExtension.contains(ext)) {
      // only extensions with a MAPPED language enter the CST path —
      // the reference's isTreeSitterSupported gate (chunking.ts:
      // 240-288). An unmapped dialect (.cs) must never be scanned
      // under another language's rules: lines starting with `class` /
      // `function` would match the JS inventory and yield
      // JS-semantics chunks instead of the reference's regex path.
      val lang = FileTypes.languageFor(ext)
      if (CstChunker.supported(lang)) {
        // zero boundaries on non-blank text means the scanner didn't
        // recognize the source — a parse failure; take the fallback
        val viaCst =
          try CstChunker.chunk(text, lang)
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        if (viaCst.nonEmpty || text.trim.isEmpty) viaCst
        else CodeChunker.chunk(text, lang, size, overlap)
      } else CodeChunker.chunk(text, lang, size, overlap)
    } else if (preserveBoundaries && filePath.isDefined &&
        FileTypes.isCodeFile(ext))
      // code extension without a language mapping (e.g. .cs):
      // straight to the regex chunker — the reference's sync
      // performBoundaryAwareChunking path (chunking.ts:195-198); its
      // indexer path never reaches here because unmapped code
      // extensions are not in the text allow-list
      CodeChunker.chunk(text, FileTypes.languageFor(ext), size, overlap)
    else
      Chunker.chunk(text, size, overlap, preserveWords)
  }
}
