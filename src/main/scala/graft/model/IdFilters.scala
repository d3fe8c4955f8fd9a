package graft
package model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder

/** Bounded id-set exclusion filters — the discipline every serve path
  * that must exclude an id set of UNBOUNDED size follows (tombstones,
  * LSM correction shadows): the driver (and every task closure) never
  * holds an unbounded `Set[Long]`. Up to a cap the filter is an exact
  * Set; past it a fixed-size Bloom bitmap whose build aggregates
  * per-word bitmasks in Spark and collects at most nbits/64 rows — the
  * driver materialization is bounded by the BITMAP size, never by the
  * id count. Bloom clearance is exact-negative (no false negatives),
  * so cleared candidates are PROVABLY outside the set; flagged
  * candidates verify against the persisted id table (pushdown point
  * lookup) — exactness is never delegated to the filter.
  *
  * Extracted from the `searchAnn` mutated-store path
  * ([[graft.api.IndexPipeline]]) so the LSM lifecycle
  * ([[graft.operators.IncrementalIndex]]) applies the identical
  * machinery to its shadow excludes and segment-id sidecars.
  */
object IdFilters {

  sealed trait IdFilter {
    /** Exact-Set view when the filter is exact; None past the cap. */
    def exact: Option[Set[Long]]
  }

  /** ≤ cap ids: exact Set, excluded at report (beams keep the ids
    * navigable — the family tombstone rule). */
  final case class IdSet(ids: Set[Long]) extends IdFilter {
    def exact: Option[Set[Long]] = Some(ids)
  }

  /** Past the cap: fixed-size broadcast-able Bloom bitmap. No false
    * negatives, so candidates it clears are provably outside the set;
    * flagged candidates verify against the persisted table. */
  final case class IdBloom(bits: Array[Long], nbits: Int,
      hashes: Int) extends IdFilter {
    def exact: Option[Set[Long]] = None
    def mayContain(id: Long): Boolean = {
      var i = 0
      while (i < hashes) {
        val p = (idHash60(id, i) % nbits).toInt
        if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](32)
  }

  /** Allocation-lean twin of `Embedder.hash60(s"$id:$i")` — the
    * per-candidate probe hash (r12 verdict item 7): the SAME md5 over
    * the SAME ASCII bytes, so it is bit-equal to the SQL-side
    * `hash60Col` the sidecar words tables were built with
    * (differential-spec-pinned), but with a thread-local digest and a
    * reusable byte buffer instead of 2 strings + a hex parse per
    * probe (8 probes per candidate dead-check in every beam report).
    * The 60-bit value is read straight off the digest bytes — the
    * first 15 hex chars of the md5 are bytes 0-6 plus byte 7's high
    * nibble. */
  private[graft] def idHash60(id: Long, i: Int): Long = {
    val b = bufLocal.get()
    var pos = 0
    def writeLong(v0: Long): Unit = {
      if (v0 == 0) { b(pos) = '0'; pos += 1 }
      else {
        var v = v0
        if (v < 0) { b(pos) = '-'; pos += 1 } else v = -v
        // digits from the NEGATIVE magnitude (safe at Long.MinValue)
        val start = pos
        while (v != 0) { b(pos) = ('0' - (v % 10)).toByte; v /= 10; pos += 1 }
        // reverse in place
        var lo = start
        var hi = pos - 1
        while (lo < hi) {
          val t = b(lo); b(lo) = b(hi); b(hi) = t; lo += 1; hi -= 1
        }
      }
    }
    writeLong(id)
    b(pos) = ':'; pos += 1
    writeLong(i.toLong)
    val d = mdLocal.get()
    d.reset()
    d.update(b, 0, pos)
    val dg = d.digest()
    ((dg(0) & 0xFFL) << 52) | ((dg(1) & 0xFFL) << 44) |
      ((dg(2) & 0xFFL) << 36) | ((dg(3) & 0xFFL) << 28) |
      ((dg(4) & 0xFFL) << 20) | ((dg(5) & 0xFFL) << 12) |
      ((dg(6) & 0xFFL) << 4) | ((dg(7) & 0xF0L) >> 4)
  }

  /** Driver-Set cap (ids; one Long each). Overridable for specs via
    * `spark.graft.ann.deadSetCap`. */
  val DefaultDriverCap = 4096L

  def driverCap(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.ann.deadSetCap")
      .map(_.toLong).getOrElse(DefaultDriverCap)

  /** Bitmap sizing: ≈16 bits per id (k=8 → fpr ~4e-4), floored at
    * 8 Kib and capped at 8 MB of driver/broadcast bitmap, rounded to
    * whole words. */
  def bloomParams(n: Long): (Int, Int) = {
    val nbits = (math.min(1L << 26,
      math.max(1L << 13, n * 16L)) / 64 * 64).toInt
    (nbits, 8)
  }

  /** The Bloom words table for an id column: one row per NONZERO word,
    * `(w, mask, nbits, hashes)` — at most nbits/64 rows, built with a
    * map-side-combinable aggregate (a distinct-positions collect is up
    * to 64× the bitmap at the cap). `idCol` must be a long column
    * named in `ids`. */
  def bloomWordsDf(ids: DataFrame, idCol: String, nbits: Int,
      hashes: Int): DataFrame = {
    val posCols = (0 until hashes).map(i =>
      Embedder.hash60Col(concat(col(idCol).cast("string"),
        lit(s":$i"))) % nbits)
    ids.select(explode(array(posCols: _*)).as("p"))
      .groupBy(expr("p div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, int(p % 64)))").as("mask"))
      .withColumn("nbits", lit(nbits))
      .withColumn("hashes", lit(hashes))
  }

  /** Collect a words table (bitmap-bounded) into an [[IdBloom]]. The
    * words rows may come straight from [[bloomWordsDf]] or from a
    * persisted sidecar. An EMPTY words table is the empty set —
    * `mayContain` is constantly false. */
  def bloomFromWords(words: Array[(Long, Long)], nbits: Int,
      hashes: Int): IdBloom = {
    val bits = new Array[Long](math.max(nbits / 64, 1))
    words.foreach { case (w, mask) => bits(w.toInt) = mask }
    IdBloom(bits, math.max(nbits, 64), hashes)
  }

  /** Read a persisted words-table sidecar (written via
    * [[bloomWordsDf]]) into an [[IdBloom]]. */
  def bloomFromSidecar(spark: SparkSession, path: String): IdBloom = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("w"), col("mask"), col("nbits"), col("hashes"))
      .as[(Long, Long, Int, Int)].collect()
    if (rows.isEmpty) IdBloom(new Array[Long](1), 64, 8)
    else bloomFromWords(rows.map(r => (r._1, r._2)), rows.head._3,
      rows.head._4)
  }

  /** Build the bounded filter for an id DataFrame of KNOWN count:
    * exact Set up to `cap` (one collect of ≤ cap longs), Bloom past
    * it (one bitmap-bounded collect). */
  def build(spark: SparkSession, ids: DataFrame, idCol: String,
      n: Long, cap: Long): IdFilter = {
    import spark.implicits._
    if (n <= cap)
      IdSet(ids.select(col(idCol)).as[Long].collect().toSet)
    else {
      val (nbits, hashes) = bloomParams(n)
      val words = bloomWordsDf(ids, idCol, nbits, hashes)
        .select(col("w"), col("mask")).as[(Long, Long)].collect()
      bloomFromWords(words, nbits, hashes)
    }
  }
}
