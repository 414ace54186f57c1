package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM invariants for the per-dataset memoization (no Spark): cache
  * hits on an unchanged fingerprint, recompute + eviction hook on change,
  * and a hook failure must not block the rebuild. */
class FingerprintSpec extends AnyFunSuite {

  private def tmpData(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("fp_spec")
    java.nio.file.Files.write(d.resolve("part-0.parquet"), "abc".getBytes)
    d
  }

  test("memo caches per fingerprint and recomputes when the data changes") {
    val d = tmpData()
    var computes = 0
    def get() = Fingerprint.memo("fp_spec_a", d.toString) {
      computes += 1; java.lang.Integer.valueOf(computes)
    }
    assert(get().intValue == 1 && get().intValue == 1, "second call is a hit")
    // change the content fingerprint (size changes — mtime alone can be
    // too coarse on filesystems with second resolution)
    java.nio.file.Files.write(d.resolve("part-0.parquet"), "abcdef".getBytes)
    assert(get().intValue == 2, "changed fingerprint must recompute")
    assert(get().intValue == 2)
  }

  test("memoEvict runs the release hook on the superseded value only") {
    val d = tmpData()
    val evicted = scala.collection.mutable.ArrayBuffer[String]()
    var v = 0
    def get() = Fingerprint.memoEvict[String]("fp_spec_b", d.toString,
        old => evicted += old) {
      v += 1; s"v$v"
    }
    assert(get() == "v1" && get() == "v1" && evicted.isEmpty,
      "no eviction while the fingerprint is stable")
    java.nio.file.Files.write(d.resolve("part-0.parquet"), "xyzw".getBytes)
    assert(get() == "v2")
    assert(evicted.toSeq == Seq("v1"), "exactly the replaced value is released")
  }

  test("a throwing eviction hook does not block the rebuild") {
    val d = tmpData()
    var v = 0
    def get() = Fingerprint.memoEvict[String]("fp_spec_c", d.toString,
        _ => sys.error("dead session")) {
      v += 1; s"v$v"
    }
    assert(get() == "v1")
    java.nio.file.Files.write(d.resolve("part-0.parquet"), "changed!".getBytes)
    assert(get() == "v2", "rebuild proceeds despite the hook throwing")
  }
}
