package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IpMath
import graft.sources.DatWriter.CityPayload

/** Randomized write → read roundtrip for the `.dat` codec: for random
  * non-overlapping prefix sets over random editions (country/city ×
  * rev0/rev1 × v4/v6), [[LegacyDat.ranges]] must emit exactly the
  * range table computed independently from the inputs — including the
  * adjacent-run merge, which only applies when two leaves share one
  * on-disk record AND their ranges are contiguous.
  */
class LegacyDatPropertySpec extends AnyFunSuite {

  /** Fixed-point quantization (see LegacyDatSpec.q). */
  private def q(v: Double): Double =
    math.round((v + 180.0) * 10000.0) / 10000.0 - 180.0

  private def bitsToBytes(bits: String, width: Int): Array[Byte] = {
    val a = new Array[Byte](width / 8)
    for (i <- bits.indices if bits.charAt(i) == '1')
      a(i / 8) = (a(i / 8) | (0x80 >> (i % 8))).toByte
    a
  }

  private def toKey(a: Array[Byte]): Array[Byte] =
    if (a.length == 16) a
    else Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1) ++ a

  private def ipString(bits: String, width: Int): String =
    IpMath.formatIp(toKey(bitsToBytes(bits, width)))

  test("property: random prefix trees roundtrip through every " +
      "edition (seed 42)") {
    val rnd = new scala.util.Random(42)
    val editions = Seq(
      (LegacyDat.CountryEdition, 32, false),
      (LegacyDat.CountryEditionV6, 128, false),
      (LegacyDat.CityEditionRev0, 32, true),
      (LegacyDat.CityEditionRev1, 32, true),
      (LegacyDat.CityEditionRev0V6, 128, true),
      (LegacyDat.CityEditionRev1V6, 128, true))

    for (iter <- 1 to 60) {
      val (dbType, width, isCity) = editions(iter % editions.length)
      val isRev1 = dbType == LegacyDat.CityEditionRev1 ||
        dbType == LegacyDat.CityEditionRev1V6

      // pool of fully-distinct payloads: reusing a pool slot is the
      // ONLY way two leaves share an on-disk record
      val cityPool = IndexedSeq(
        CityPayload(LegacyTables.indexOf("US"), "23", "A", "04101",
          12.5, -70.25, Some((500, 207))),
        CityPayload(LegacyTables.indexOf("US"), "09", "B", "06101",
          41.75, -72.5, Some((533, 860))),
        CityPayload(LegacyTables.indexOf("DE"), "01", "C", "",
          48.25, 9.75, None),
        CityPayload(LegacyTables.indexOf("JE"), "00", "D", "JE2",
          49.25, -2.25, None))
      val countryPool = IndexedSeq("US", "DE", "JP", "BR")
        .map(LegacyTables.indexOf)

      // random non-overlapping prefixes (bit strings); v6 pinned to
      // 2000::/4 so formatting never collapses to v4-mapped notation
      val accepted = ArrayBuffer.empty[(String, Int)] // (bits, poolIdx)
      for (_ <- 1 to 20) {
        val len =
          if (width == 32) 2 + rnd.nextInt(27)
          else 4 + rnd.nextInt(60)
        val sb = new StringBuilder(len)
        if (width == 128) sb.append("0010".take(math.min(4, len)))
        while (sb.length < len) sb.append(if (rnd.nextBoolean()) '1' else '0')
        val bits = sb.toString
        val overlaps = accepted.exists { case (b, _) =>
          b.startsWith(bits) || bits.startsWith(b)
        }
        if (!overlaps) accepted += bits -> rnd.nextInt(4)
      }

      val bytes =
        if (isCity)
          DatWriter.buildCity(accepted.toSeq.map { case (b, p) =>
            (ipString(b, width), b.length, cityPool(p))
          }, dbType)
        else
          DatWriter.buildCountry(accepted.toSeq.map { case (b, p) =>
            (ipString(b, width), b.length, countryPool(p))
          }, v6 = width == 128)

      // independent expectation: sort by address, merge contiguous
      // runs sharing a pool slot
      val sorted = accepted.sortBy(_._1).toVector
      def loOf(b: String) = BigInt(1, bitsToBytes(b, width))
      def hiOf(b: String) =
        loOf(b) + (BigInt(1) << (width - b.length)) - 1
      val merged = ArrayBuffer.empty[(BigInt, BigInt, Int)]
      sorted.foreach { case (b, p) =>
        merged.lastOption match {
          case Some((lo, hi, pp)) if pp == p && hiOf(b) > hi &&
              loOf(b) == hi + 1 =>
            merged(merged.length - 1) = (lo, hiOf(b), p)
          case _ => merged += ((loOf(b), hiOf(b), p))
        }
      }

      val got = LegacyDat.ranges(bytes)
      assert(got.length == merged.length,
        s"iter $iter dbType $dbType: ${got.length} != ${merged.length}")
      got.zip(merged).foreach { case (row, (lo, hi, p)) =>
        def big(a: Array[Byte], v4: Boolean) =
          BigInt(1, if (v4 && width == 32) a.drop(12) else a)
        assert(big(row.lo, v4 = true) == lo, s"iter $iter lo")
        assert(big(row.hi, v4 = true) == hi, s"iter $iter hi")
        if (isCity) {
          val exp = cityPool(p)
          assert(row.country_code == LegacyTables.code(exp.countryIdx))
          assert(row.country_name == LegacyTables.name(exp.countryIdx))
          assert(row.region == exp.region && row.city == exp.city &&
            row.postal_code == exp.postal)
          assert(row.latitude == q(exp.lat) && row.longitude == q(exp.lon))
          val (em, ea) =
            if (isRev1 && LegacyTables.code(exp.countryIdx) == "US")
              exp.metroArea.getOrElse((0, 0))
            else (0, 0)
          assert(row.metro_code == em.toLong && row.area_code == ea.toLong,
            s"iter $iter metro/area")
        } else {
          assert(row.country_code == LegacyTables.code(countryPool(p)))
          assert(row.country_code3 == LegacyTables.code3(countryPool(p)))
          assert(row.region == "" && row.latitude == null &&
            row.metro_code == null)
        }
      }
    }
  }

  test("property: random byte mutations never escape the typed error " +
      "surface (seed 7)") {
    val rnd = new scala.util.Random(7)
    val base = DatWriter.buildCity(Seq(
      ("1.0.0.0", 24, CityPayload(LegacyTables.indexOf("US"), "23",
        "Portland", "04101", 43.6615, -70.2553, Some((500, 207)))),
      ("5.5.5.0", 24, CityPayload(LegacyTables.indexOf("DE"), "01",
        "Stuttgart", "", 48.25, 9.75, None))))
    for (iter <- 1 to 500) {
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 1 to flips)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      // a mutated blob must either parse (possibly to garbage rows)
      // or raise one of the two typed errors the budget path counts;
      // anything else (AIOOBE, NegativeArraySize, stack overflow)
      // would kill an executor stage instead
      try {
        val rows = LegacyDat.ranges(mutated)
        assert(rows.length <= (1 << 16), s"iter $iter: runaway output")
      } catch {
        case _: LegacyDat.CorruptDat => ()
        case _: LegacyDat.UnsupportedEdition => ()
        case e: Throwable =>
          fail(s"iter $iter: untyped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // truncations at every length, same contract
    for (cut <- 0 until base.length) {
      try LegacyDat.ranges(base.take(cut))
      catch {
        case _: LegacyDat.CorruptDat | _: LegacyDat.UnsupportedEdition => ()
        case e: Throwable =>
          fail(s"cut $cut: untyped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
