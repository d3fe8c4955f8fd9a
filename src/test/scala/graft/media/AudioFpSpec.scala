package graft
package media

import graft.operators.Media

/** Audio spectral fingerprint ([[Media.qAudioFp]]): a pure tone must
  * concentrate its energy in its own band, identical waveforms must
  * fingerprint identically (the audio near-dup key), and the engine
  * query must match a driver-side recompute over real decoded bytes.
  */
class AudioFpSpec extends SparkSpec {

  test("pure tones concentrate energy in their own band") {
    Seq(500 -> 16, 1000 -> 8, 2000 -> 4).foreach { case (tone, p) =>
      // synthetic PCM tone at amplitude 1000, 160 samples (10 periods
      // of the slowest band, so every band's table completes cycles)
      val v = Array.tabulate(160)(i =>
        math.round(1000.0 * math.cos(2 * math.Pi * i / p)).toInt)
      val by = Media.bandFp(0L, v).map(f => f.f_hz -> f.energy).toMap
      val own = by(tone.toLong)
      (by - tone.toLong).foreach { case (other, e) =>
        assert(own > 100L * math.max(e, 1),
          s"tone $tone: own=$own but band $other has $e")
      }
    }
  }

  test("identical waveforms fingerprint identically; distinct ones differ") {
    // doc ids congruent mod 4096 synthesize the SAME samples — the
    // planted audio near-dup pair
    val a = Media.bandFp(17L, Media.wavSamples(Media.wavBytes(17L, 150)))
    val b = Media.bandFp(17L + 4096L,
      Media.wavSamples(Media.wavBytes(17L + 4096L, 150)))
    assert(a.map(f => (f.f_hz, f.c, f.s, f.energy)) ===
      b.map(f => (f.f_hz, f.c, f.s, f.energy)))
    val c = Media.bandFp(18L, Media.wavSamples(Media.wavBytes(18L, 150)))
    assert(a.map(_.energy) !== c.map(_.energy))
  }

  test("engine query matches the driver-side recompute over decoded bytes") {
    val got = Media.qAudioFp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "CAST(100 + n_chars % 100 AS INT) AS n")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(docs.nonEmpty && got.size === docs.length * 3)
    docs.take(50).foreach { case (id, n) =>
      Media.bandFp(id, Media.wavSamples(Media.wavBytes(id, n))).foreach { f =>
        assert(got((id, f.f_hz)) === ((f.c, f.s, f.energy)), s"doc $id")
      }
    }
  }
}
