package graft
package model

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.Embedder

/** The allocation-lean probe hash ([[IdFilters.idHash60]]) must be
  * BIT-EQUAL to `Embedder.hash60(s"$id:$i")` — the sidecar Bloom
  * words tables are built with the SQL-side `hash60Col` over exactly
  * that string, so any divergence would silently break the no-false-
  * negatives contract every verified-report serve relies on. */
class IdHashSpec extends AnyFunSuite {

  test("idHash60 is bit-equal to the string-md5 hash60 across the id " +
      "space: positive, negative, boundary, and the full hash range") {
    val ids: Seq[Long] = Seq(0L, 1L, -1L, 9L, 10L, -10L, 123456789L,
      -987654321L, Long.MaxValue, Long.MinValue, Long.MinValue + 1,
      (1L << 60) - 1) ++
      (0 until 200).map(i => Embedder.hash60(s"probe:$i")) ++
      (0 until 50).map(i => -Embedder.hash60(s"neg:$i"))
    ids.foreach { id =>
      (0 until 8).foreach { i =>
        assert(IdFilters.idHash60(id, i) === Embedder.hash60(s"$id:$i"),
          s"divergence at id=$id i=$i")
      }
    }
  }

  test("bloom membership through the lean hash: planted ids always " +
      "flag (no false negatives)") {
    val planted = (0 until 500).map(i => Embedder.hash60(s"pl:$i"))
    val (nbits, hashes) = IdFilters.bloomParams(planted.size.toLong)
    val bits = new Array[Long](nbits / 64)
    planted.foreach { id =>
      (0 until hashes).foreach { i =>
        val p = (Embedder.hash60(s"$id:$i") % nbits).toInt
        bits(p >> 6) |= (1L << (p & 63))
      }
    }
    val bloom = IdFilters.IdBloom(bits, nbits, hashes)
    planted.foreach(id => assert(bloom.mayContain(id),
      s"planted id $id not flagged — a false negative"))
  }
}
