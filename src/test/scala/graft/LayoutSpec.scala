package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Golden tests for the storage-layout operators: Morton-code bit math
  * and the two-dimensional scan-locality property that is the whole
  * point of a Z-ordered write (a one-column sort gives thin full-height
  * stripes; Z-order gives small rectangles, so file-level min/max stats
  * prune on EITHER dimension). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue: bit interleaving matches hand-computed Morton codes") {
    // z(a,b): bit i of a lands at 2i, bit i of b at 2i+1
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L) // a bit0 -> z bit0
    assert(rows((0L, 1L)) == 2L) // b bit0 -> z bit1
    assert(rows((3L, 3L)) == 15L) // 11 interleaved with 11 -> 1111
    // a=101, b=010 -> z bits 0,4 from a and 3 from b -> 1+16+8
    assert(rows((5L, 2L)) == 25L)
  }

  test("zorderValue: inputs are masked to the configured bit width") {
    // bits=2 keeps only the low 2 bits: a=5 -> 01, b=2 -> 10
    val z = Seq((5L, 2L)).toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y"), bits = 2).as("z"))
      .as[Long].head()
    assert(z == 9L) // a bit0 -> z bit0, b bit1 -> z bit3
  }

  test("writeZordered: files cover rectangles and prune on either dimension") {
    // dense 64x64 grid -> 16 z-clustered files of ~256 points each
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder_").toString + "/t"
    Layout.writeZordered(grid, "x", "y", dir, numFiles = 16, bits = 6)

    val byFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(byFile.length == 16, s"one file per range partition: ${byFile.length}")

    // rectangle property: a contiguous Morton interval of ~256 points
    // spans ~16-32 per dim; only an interval straddling the single
    // top-level quadrant boundary can go full-width. An x-sorted stripe
    // layout would put a FULL 64-span y range in every file.
    val tight = byFile.count { case (_, xmin, xmax, ymin, ymax, _) =>
      (xmax - xmin) <= 40 && (ymax - ymin) <= 40
    }
    assert(tight >= 12, s"most files must be small rectangles, got $tight/16")

    // pruning property: every point with y < 8 has z <= interleave(63,7)
    // = 1407, i.e. lives in the first ~5.5 of 16 files — a reader
    // filtering y < 8 skips most files on min/max stats alone. Same for
    // x < 8 by symmetry. A one-column sort cannot do both.
    val touchedY = byFile.count { case (_, _, _, ymin, _, _) => ymin < 8 }
    val touchedX = byFile.count { case (_, xmin, _, _, _, _) => xmin < 8 }
    assert(touchedY <= 8, s"y<8 must touch a minority of files: $touchedY/16")
    assert(touchedX <= 8, s"x<8 must touch a minority of files: $touchedX/16")
  }
}
