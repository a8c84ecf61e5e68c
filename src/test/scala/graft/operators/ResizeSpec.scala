package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer box-filter resize: exact floor-mean goldens,
  * crop-to-multiple, degenerate smaller-than-box frames, and a
  * brute-force replay property across random frames and factors.
  */
class ResizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def resize(px: Array[Int], w: Int, h: Int, fx: Int,
      fy: Int): (Int, Int, Seq[Int]) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val r = Seq((px.toSeq, w, h)).toDF("px", "w", "h")
      .select(Multimodal.resizeBox(col("px"), col("w"), col("h"),
        fx, fy).as("r"))
      .select("r.out_w", "r.out_h", "r.px")
      .as[(Int, Int, Seq[Int])].head()
    r
  }

  /** Plain-Scala replay of the floor-mean box rule. */
  private def expected(px: Array[Int], w: Int, h: Int, fx: Int,
      fy: Int): (Int, Int, Seq[Int]) = {
    val (ow, oh) = (w / fx, h / fy)
    val out = for (oy <- 0 until oh; ox <- 0 until ow) yield {
      val s = (for (dy <- 0 until fy; dx <- 0 until fx)
        yield px((oy * fy + dy) * w + ox * fx + dx)).sum
      math.floorDiv(s, fx * fy)
    }
    (ow, oh, out)
  }

  test("2x2 box over a 4x4 gradient: exact floor means") {
    val px = Array.tabulate(16)(identity) // rows 0..3, cols 0..3
    // block (0,0) = {0,1,4,5} -> 10/4 = 2
    assert(resize(px, 4, 4, 2, 2) == ((2, 2, Seq(2, 4, 10, 12))))
  }

  test("crop-to-multiple drops trailing rows and columns") {
    val px = Array.tabulate(5 * 3)(identity) // 5 wide, 3 tall
    val got = resize(px, 5, 3, 2, 2)
    assert(got._1 == 2 && got._2 == 1 && got._3.length == 2)
    assert(got == expected(px, 5, 3, 2, 2))
  }

  test("frame smaller than the box yields an empty raster, not a " +
      "reversed index range") {
    assert(resize(Array(1, 2, 3, 4, 5, 6), 3, 2, 4, 3) == ((0, 0, Seq())))
  }

  test("identity factors return the frame unchanged") {
    val px = Array(9, 8, 7, 6)
    assert(resize(px, 2, 2, 1, 1) == ((2, 2, px.toSeq)))
  }

  test("brute-force replay property across random frames and factors") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 15) {
      val w = 1 + rnd.nextInt(20)
      val h = 1 + rnd.nextInt(12)
      val fx = 1 + rnd.nextInt(5)
      val fy = 1 + rnd.nextInt(4)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      assert(resize(px, w, h, fx, fy) == expected(px, w, h, fx, fy),
        s"w=$w h=$h fx=$fx fy=$fy")
    }
  }

  private def decimate(xs: Seq[Int], f: Int): Seq[Int] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    Seq(Tuple1(xs)).toDF("s")
      .select(Multimodal.decimate(col("s"), f).as("d"))
      .as[Seq[Int]].head()
  }

  test("decimate floor-means each block, flooring negatives toward " +
      "-inf (PCM symmetry, not truncation)") {
    assert(decimate(Seq(1, 2, 3, 5), 2) == Seq(1, 4))
    // (-3 + -4) / 2 = -3.5 -> floor -4; (3 + 4) / 2 = 3.5 -> floor 3
    assert(decimate(Seq(-3, -4, 3, 4), 2) == Seq(-4, 3))
  }

  test("decimate crops the trailing partial block and empties out " +
      "short inputs") {
    assert(decimate(Seq(10, 20, 30, 40, 99), 2) == Seq(15, 35))
    assert(decimate(Seq(7, 8), 3) == Seq())
    assert(decimate(Seq(), 4) == Seq())
  }

  test("decimate by 1 is the identity") {
    assert(decimate(Seq(5, -6, 7), 1) == Seq(5, -6, 7))
  }
}
