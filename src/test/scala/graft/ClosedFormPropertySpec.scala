package graft

import graft.functions.TimeFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the session's closed forms against
  * brute-force references: business-day arithmetic vs a day-walking
  * loop, and the CDC chunk kernel vs a straightforward re-chunker. */
class ClosedFormPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  test("businessDayAdd equals the day-walking reference on 200 random (date, n)") {
    import java.time.{DayOfWeek, LocalDate}
    def walkAdd(d: LocalDate, n: Int): LocalDate = {
      def isBd(x: LocalDate) = x.getDayOfWeek != DayOfWeek.SATURDAY &&
        x.getDayOfWeek != DayOfWeek.SUNDAY
      // pandas BDay: weekend start acts as the preceding Friday
      var cur = d
      while (!isBd(cur)) cur = cur.minusDays(1)
      var left = n
      while (left > 0) {
        cur = cur.plusDays(1)
        while (!isBd(cur)) cur = cur.plusDays(1)
        left -= 1
      }
      cur
    }
    val cases = lcg(7L).take(200).map { x =>
      val day = math.floorMod(x >>> 13, 20000L).toInt // 1970..2024-ish
      val n = math.floorMod(x >>> 41, 30L).toInt
      (LocalDate.ofEpochDay(day.toLong), n)
    }.toSeq
    // evaluate each n as its own column batch (n is a literal in the API)
    cases.groupBy(_._2).foreach { case (n, cs) =>
      val got = cs.map(_._1.toString).toDF("d")
        .select(col("d"), TimeFns.businessDayAdd(to_date(col("d")), n)
          .cast("string").as("r"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      cs.foreach { case (d, _) =>
        assert(got(d.toString) == walkAdd(d, n).toString,
          s"businessDayAdd($d, $n)")
      }
    }
  }

  test("businessDaysBetween equals the counting reference on 200 random spans") {
    import java.time.{DayOfWeek, LocalDate}
    def walkCount(a: LocalDate, b: LocalDate): Long =
      Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
        .count(x => x.getDayOfWeek != DayOfWeek.SATURDAY &&
          x.getDayOfWeek != DayOfWeek.SUNDAY).toLong
    val cases = lcg(11L).take(200).map { x =>
      val day = math.floorMod(x >>> 13, 20000L).toInt
      val span = math.floorMod(x >>> 41, 400L).toInt
      (LocalDate.ofEpochDay(day.toLong), LocalDate.ofEpochDay(day.toLong + span))
    }.toSeq
    val got = cases.map { case (a, b) => (a.toString, b.toString) }
      .toDF("a", "b")
      .select(col("a"), col("b"), TimeFns.businessDaysBetween(
        to_date(col("a")), to_date(col("b"))).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    cases.foreach { case (a, b) =>
      assert(got((a.toString, b.toString)) == walkCount(a, b),
        s"businessDaysBetween($a, $b)")
    }
  }

  test("CdcChunkDigests equals a straightforward re-chunker on random strings") {
    import graft.expressions.CdcChunkDigests
    import org.apache.spark.unsafe.types.UTF8String
    def reference(s: String): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      val cps = s.codePoints().toArray
      val n = cps.length
      val boundaries = (7 until n).filter { ie =>
        val h = (0 until 8).map(k =>
          cps(ie - 7 + k).toLong * CdcChunkDigests.pows(k)).sum
        h % CdcChunkDigests.M % 64 == 0
      }
      val allCuts =
        if (boundaries.lastOption.contains(n - 1)) boundaries
        else boundaries :+ (n - 1)
      var prev = -1
      allCuts.map { end =>
        val chunk = new String(cps, prev + 1, end - prev)
        prev = end
        hex(md.digest(chunk.getBytes("UTF-8")))
      }
    }
    def kernel(s: String): Seq[String] = {
      val arr = CdcChunkDigests.compute(UTF8String.fromString(s))
      (0 until arr.numElements()).map(i =>
        arr.getUTF8String(i).toString)
    }
    val words = Vector("aa", "bb", "cc", "dd", "spark", "data", "x")
    val rnds = lcg(23L)
    (0 until 60).foreach { _ =>
      val len = math.floorMod(rnds.next() >>> 7, 40L).toInt
      val s = (0 until len)
        .map(_ => words(math.floorMod(rnds.next() >>> 9,
          words.length.toLong).toInt))
        .mkString(" ")
      assert(kernel(s) == reference(s), s"mismatch on: '$s'")
    }
    assert(kernel("") == reference(""))   // empty → one empty chunk
    assert(kernel("ab") == reference("ab")) // below window
  }

  test("TextEntropyNanos equals a map-based reference on 80 random strings") {
    import graft.expressions.TextEntropyNanos
    import org.apache.spark.unsafe.types.UTF8String
    def reference(s: String, order: Int): Long = {
      val cps = s.codePoints().toArray
      val grams =
        if (order == 1) cps.toSeq.map(_.toString)
        else cps.toSeq.sliding(2).filter(_.size == 2).map(_.mkString(",")).toSeq
      if (grams.isEmpty) 0L
      else {
        val n = grams.size.toDouble
        grams.groupBy(identity).values.map { g =>
          val p = g.size / n
          java.math.BigDecimal.valueOf(p * Math.log(p))
            .setScale(9, java.math.RoundingMode.HALF_UP)
            .movePointRight(9).longValueExact()
        }.sum
      }
    }
    val alphabet = "aabbccdeefg 中文。!?\n" // skewed, multi-byte, whitespace
    lcg(99L).take(80).zipWithIndex.foreach { case (x, i) =>
      val len = math.floorMod(x >>> 7, 400L).toInt
      val s = Iterator.iterate(x)(y => y * 6364136223846793005L + 1442695040888963407L)
        .take(len).map(y => alphabet(math.floorMod(y >>> 33, alphabet.length.toLong).toInt))
        .mkString
      for (order <- Seq(1, 2))
        assert(TextEntropyNanos.compute(UTF8String.fromString(s), order) ==
          reference(s, order), s"order $order on case $i: '${s.take(40)}'")
    }
    // edges: empty (0), single char (p=1 → ln 1 = 0), len-1 bigram (no grams)
    for (order <- Seq(1, 2); s <- Seq("", "x", "xx", "xy"))
      assert(TextEntropyNanos.compute(UTF8String.fromString(s), order) ==
        reference(s, order), s"edge '$s' order $order")
  }
}
