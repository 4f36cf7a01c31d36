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

  test("table-based cell assignment (large-nCells regime) is bit-identical to the literal path") {
    // literalAssignCells = 0 forces the broadcast-table argmin for the
    // SAME 16 centroids the literal path embeds in codegen; identical
    // IEEE arithmetic + lexicographic struct min → identical cells →
    // identical top-k, bit for bit
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 5)
    val lit = Similarity.ivfTopK(emb, q, 10, nCells = 16, nProbe = 4)
      .collect().toSeq
    val tab = Similarity.ivfTopK(emb, q, 10, nCells = 16, nProbe = 4,
        literalAssignCells = 0)
      .collect().toSeq
    assert(lit.nonEmpty && lit == tab)
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

class PqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("PQ ADC carries signal: recall beats the random-candidate baseline") {
    // this corpus is near-uniform random noise — the adversarial case
    // for a 16-codeword untrained codebook, where true top-10 cosines
    // sit barely above background. The honest claim is that the ADC
    // candidate stage is much better than picking candidates at
    // random, not that it solves noise retrieval.
    val emb = Tables.t(spark, sf, "embeddings").cache()
    val n = emb.count().toDouble
    val queries = emb.filter($"vec_id" < 3)
    val brute = Similarity.bruteTopK(emb, queries, 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, queries, 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(pq.size == brute.size)
    val recall = pq.intersect(brute).size.toDouble / brute.size
    val randomBaseline = 40.0 / n // P(true neighbor in 40 random candidates)
    assert(recall > 2 * randomBaseline,
      s"PQ recall $recall vs random-candidate baseline $randomBaseline")
  }

  test("PQ finds planted near-duplicates at rank 1") {
    // the dedup-grade regime PQ is deployed for: a near-identical copy
    // (cos ≈ 0.99 vs a ≤0.5 background) must dominate ADC scoring,
    // survive the candidate cut, and re-rank to the top
    val base = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val planted = base.filter($"vec_id" < 3)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * 0.98 + 0.02).as("embedding"))
    val corpus = base.union(planted)
    val queries = planted
    val top1 = Similarity.pqTopK(corpus, queries, k = 5)
      .filter($"rk" === 1).select("qid", "id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(i => assert(top1(i + 1000000L) == i))
  }

  test("PQ run is deterministic across invocations") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 2)
    val a = Similarity.pqTopK(emb, q, 5).collect().toSeq
    val b = Similarity.pqTopK(emb, q, 5).collect().toSeq
    assert(a == b)
  }

  test("rerank=∞ degenerate: PQ with all candidates equals brute force") {
    // with rerank·k >= corpus size the candidate stage passes everything
    // through and the exact re-rank must reproduce brute force verbatim
    val emb = Tables.t(spark, sf, "embeddings").limit(120).cache()
    val q = emb.filter($"vec_id" < 2)
    val brute = Similarity.bruteTopK(emb, q, 8)
      .select("qid", "id", "rk").as[(Long, Long, Int)].collect().toSet
    val pq = Similarity.pqTopK(emb, q, 8, rerank = 1000)
      .select("qid", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(pq == brute)
  }
}
