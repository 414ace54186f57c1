package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ZOrderSpec extends SparkSuite {

  test("interleave places a-bits even, b-bits odd") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L) // a bit 0 -> result bit 0
    assert(ZOrder.interleave(0L, 1L) == 2L) // b bit 0 -> result bit 1
    assert(ZOrder.interleave(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(ZOrder.interleave(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(ZOrder.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    assert(ZOrder.interleave(0L, 0xffffffffL) == 0xaaaaaaaaaaaaaaaaL)
  }

  test("codegen expression matches the scala implementation") {
    import spark.implicits._
    ZOrder.register(spark)
    val df = Seq((0L, 0L), (1L, 2L), (12345L, 67890L), (0xffffffffL, 7L))
      .toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
        call_function("graft_zorder", col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, z) => assert(z == ZOrder.interleave(a, b)) }
  }

  test("z-order preserves per-dimension locality (prefix property)") {
    // points in the same 2^16-aligned tile share their high 32 z-bits,
    // which is exactly why min/max file stats prune on either dimension
    val z1 = ZOrder.interleave(65536L, 131072L)
    val z2 = ZOrder.interleave(65537L, 131073L)
    assert((z1 >>> 34) == (z2 >>> 34))
  }

  test("nulls propagate") {
    import spark.implicits._
    ZOrder.register(spark)
    val df = Seq((Some(1L), None: Option[Long]), (None, Some(2L))).toDF("a", "b")
    val got = df.select(call_function("graft_zorder", col("a"), col("b")))
      .collect().map(_.isNullAt(0))
    assert(got.forall(identity))
  }
}
