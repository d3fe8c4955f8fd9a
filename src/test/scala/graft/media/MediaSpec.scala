package graft
package media

import java.security.MessageDigest

import graft.operators.Media.MediaStub

class MediaSpec extends SparkSpec {

  test("decode stub is deterministic and md5-anchored") {
    val md = MessageDigest.getInstance("MD5")
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    val m = MediaStub.decode(7L, "abc".getBytes("UTF-8"), md)
    assert(m.content_hash === "900150983cd24fb0d6963f7d28e17f72")
    assert(m.byte_len === 3L)
    assert(m.mime === "image/png") // 3 % 3 == 0
    assert(m.width === 0x9001L % 1280 + 1)
    assert(m.height === 0x5098L % 720 + 1)
    assert(m.frames === 1L)
    // stable across calls with a shared digest instance
    val m2 = MediaStub.decode(7L, "abc".getBytes("UTF-8"), md)
    assert(m === m2)
  }

  test("binary metadata query covers every doc exactly once") {
    val out = graft.operators.Media.qMediaMeta(spark, sfDir)
    assert(out.count() === Tables.documents(spark, sfDir).count())
    assert(out.select("doc_id").distinct().count() === out.count())
  }
}
