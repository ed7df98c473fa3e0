package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the z-order layout contracts: the Morton interleave formula, the
  * generated-SQL parity (the zValueSql text must compute the identical
  * value when evaluated by Spark's own SQL engine), the census's exact
  * equi-depth quadrant recovery on a regular grid, and the write path's
  * partition-count + within-partition-sortedness guarantees.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 1L))
      .toDF("x", "y")
    val got = df.select(Layout.zValue(col("x"), col("y"), 2).as("z"))
      .as[Long].collect().toSeq
    // Morton codes: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,0)=4 (3,1)=7
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 7L))
  }

  test("zValueSql computes the identical value as the Column form") {
    val df = Seq((13L, 6L), (255L, 0L), (1000L, 999L), (0L, 65535L))
      .toDF("x", "y")
    val both = df.select(
      Layout.zValue(col("x"), col("y"), 16).as("a"),
      expr(Layout.zValueSql("x", "y", 16)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("zorderCensus recovers exact quadrants on a 4x4 grid") {
    val grid = (for { x <- 0 to 3; y <- 0 to 3 }
      yield (x.toLong, y.toLong, (x * 4 + y).toLong)).toDF("x", "y", "tie")
    val got = Layout.zorderCensus(grid, "x", "y", "tie",
        buckets = 4, bits = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // z-order visits the 2x2 quadrants consecutively, so 4 equi-depth
    // buckets over 16 rows are EXACTLY the quadrants — each bounding box
    // is 2x2, never a full-width stripe (that is the point of z-order).
    assert(got == Seq(
      (1L, 4L, 0L, 1L, 0L, 1L), (2L, 4L, 2L, 3L, 0L, 1L),
      (3L, 4L, 0L, 1L, 2L, 3L), (4L, 4L, 2L, 3L, 2L, 3L)))
  }

  test("zorderPartitioned: requested partition count, sorted within each") {
    val grid = (for { x <- 0 to 15; y <- 0 to 15 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val laid = Layout.zorderPartitioned(grid, "x", "y",
      numPartitions = 4, bits = 4)
    assert(laid.rdd.getNumPartitions == 4)
    val zIdx = laid.schema.fieldIndex("zval")
    val perPart = laid.rdd.mapPartitionsWithIndex { (i, it) =>
      val zs = it.map(_.getLong(zIdx)).toVector
      if (zs.isEmpty) Iterator.empty
      else Iterator((i, zs == zs.sorted, zs.head, zs.last))
    }.collect().toSeq.sortBy(_._1)
    assert(perPart.forall(_._2), "each partition sorted by zval")
    // range partitioning: the partitions' [min,max] z ranges do not overlap
    val ordered = perPart.sortBy(_._3)
    assert(ordered.sliding(2).forall {
      case Seq(a, b) => a._4 <= b._3
      case _         => true
    }, "partition z ranges disjoint and ordered")
  }
}
