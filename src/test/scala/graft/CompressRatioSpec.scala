package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CompressUtil
import graft.queries.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

/** Pins what the missing DuckDB oracle can't for text_compress_ratio:
  * exact agreement with a driver-side recompute through the same kernel,
  * run-to-run determinism, the discrimination property the signal exists
  * for, and SQL-face registration. */
class CompressRatioSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("corpus ratios equal the driver-side kernel recompute exactly") {
    val got = TextAnalysis.textCompressRatio(spark, sf)
      .as[(Long, Long, Long, Double, String)].collect()
    assert(got.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    got.foreach { case (id, raw, defl, ratio, flag) =>
      val t = texts(id)
      val bytes = t.getBytes("UTF-8").length.toLong
      assert(raw == bytes, s"doc $id raw_bytes")
      assert(defl == CompressUtil.deflatedSize(UTF8String.fromString(t)),
        s"doc $id deflated_bytes must match the shared kernel")
      val expRatio = if (bytes == 0) 1.0 else defl.toDouble / bytes
      assert(ratio == expRatio, s"doc $id ratio")
      val expFlag = if (expRatio < 0.35) "too_compressible"
        else if (expRatio > 0.85) "incompressible" else "ok"
      assert(flag == expFlag, s"doc $id flag")
    }
    // bitwise-stable across runs (no RNG, no shared Deflater state)
    val again = TextAnalysis.textCompressRatio(spark, sf)
      .as[(Long, Long, Long, Double, String)].collect()
    assert(got.sameElements(again))
  }

  test("discrimination: repetitive << prose < random; flags fire") {
    def ratio(s: String): Double =
      CompressUtil.deflatedSize(UTF8String.fromString(s)).toDouble /
        s.getBytes("UTF-8").length
    val repetitive = "buy now click here " * 80
    val prose = "the engine reads each document once and scores it by how " +
      "much structure the compressor can find in the byte stream, which " +
      "separates template spam from genuine writing rather well in practice"
    // deterministic pseudo-random bytes (printable, seeded — no RNG state)
    val rnd = {
      var x = 0x9e3779b97f4a7c15L
      (1 to 600).map { _ =>
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        (33 + math.floorMod(x, 94)).toChar
      }.mkString
    }
    assert(ratio(repetitive) < 0.35, s"repetitive ${ratio(repetitive)}")
    assert(ratio(prose) > 0.35 && ratio(prose) < 0.85, s"prose ${ratio(prose)}")
    assert(ratio(rnd) > 0.85, s"random ${ratio(rnd)}")
  }

  test("SQL face: deflated_size registers through the extensions") {
    val r = spark.sql(
      "SELECT deflated_size('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS d")
      .as[Long].head()
    assert(r == CompressUtil.deflatedSize(UTF8String.fromString("a" * 32)))
    assert(r < 32, "a run of one byte must compress below itself")
  }
}
