package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.operators.{Embed, Embedder, HashEmbedder, Ivf}
import graft.sources.ViewingData

/** The production-embedder SWAP POINT (operators/Embed.scala): a real
  * model binding implements [[Embedder]]; everything downstream is
  * already proven against the deterministic fake. Pins (1) the
  * mapPartitions plumbing is value-exact vs the SQL hash stub, (2)
  * the batch contract (sizes, order, misbehavior rejected), (3) the
  * full chunk → embed → IVF build → probe chain composes through the
  * interface. */
object EmbedContractSpec {
  // executor-side call log (local[*] = one JVM, so statics observe it)
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val maxSeen = new AtomicInteger(0)
}

/** An embedder that records batch sizes through the static log. */
final case class CountingEmbedder(dim: Int) extends Embedder {
  private val inner = HashEmbedder(dim)
  def embed(texts: Seq[String]): Seq[Array[Double]] = {
    EmbedContractSpec.calls.add(texts.length)
    EmbedContractSpec.maxSeen.getAndAccumulate(texts.length, math.max)
    inner.embed(texts)
  }
}

/** Misbehaving fakes: wrong vector count / wrong dim. */
final case class DropOneEmbedder(dim: Int) extends Embedder {
  def embed(texts: Seq[String]): Seq[Array[Double]] =
    HashEmbedder(dim).embed(texts).drop(1)
}
final case class WrongDimEmbedder(dim: Int) extends Embedder {
  def embed(texts: Seq[String]): Seq[Array[Double]] =
    HashEmbedder(dim + 1).embed(texts)
}

class EmbedContractSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  test("mapPartitions plumbing is value-EXACT vs the SQL hash stub; carries pass through") {
    val docs = ViewingData.table(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).limit(200)
    val viaOperator = Embed.withEmbeddings(docs, "text", "e", HashEmbedder(dim))
      .select(col("doc_id"), col("lang"), col("e"))
    val viaSql = docs.select(col("doc_id"), col("lang"),
      QueriesLLM.hashEmbed(col("text"), dim).as("e"))
    val a = viaOperator.as[(Long, String, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val b = viaSql.as[(Long, String, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(a.keySet == b.keySet, "carry columns must pass through untouched")
    a.foreach { case (k, e) =>
      assert(e == b(k), s"doc $k: operator and SQL stub embeddings differ")
    }
  }

  test("batch contract: ≤ batchSize texts per call, all rows embedded, order kept") {
    EmbedContractSpec.calls.clear()
    EmbedContractSpec.maxSeen.set(0)
    val docs = ViewingData.table(spark, Sf, "documents")
      .select("doc_id", "text").limit(150).repartition(4)
    val out = Embed.withEmbeddings(docs, "text", "e",
      CountingEmbedder(dim), batchSize = 16)
    assert(out.count() == 150)
    val sizes = EmbedContractSpec.calls.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == 150, s"every text embedded exactly once: $sizes")
    assert(EmbedContractSpec.maxSeen.get() <= 16,
      s"no call may exceed batchSize, saw ${EmbedContractSpec.maxSeen.get()}")
    // schema: appended array<double> column, original columns first
    assert(out.columns.toSeq == Seq("doc_id", "text", "e"))
  }

  test("misbehaving bindings fail the job instead of misaligning rows") {
    val docs = ViewingData.table(spark, Sf, "documents")
      .select("doc_id", "text").limit(20).coalesce(1)
    intercept[Exception] {
      Embed.withEmbeddings(docs, "text", "e", DropOneEmbedder(dim)).count()
    }
    intercept[Exception] {
      Embed.withEmbeddings(docs, "text", "e", WrongDimEmbedder(dim)).count()
    }
    intercept[IllegalArgumentException] { // output column collision
      Embed.withEmbeddings(docs, "text", "text", HashEmbedder(dim))
    }
  }

  test("chunk → Embed.withEmbeddings → IVF build → probe composes through the interface") {
    graft.plans.GraftExtensions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("embed-ivf").toString
    val docs = ViewingData.table(spark, Sf, "documents").select("doc_id", "text")
    val chunks = Embed.withEmbeddings(
        QueriesLLM.chunkDocs(docs, 64, 48), "chunk_text", "e",
        HashEmbedder(dim), batchSize = 32)
      .withColumn("chunk_id", col("doc_id") * 1000 + col("chunk_idx"))
      .select(col("chunk_id"), col("chunk_text"), col("e"))
      .localCheckpoint()
    val seeded = chunks.withColumn("cell",
      pmod(xxhash64(col("chunk_id")), lit(8)).cast("int"))
    val (index, cents) = Ivf.refine(seeded, "chunk_id", "e", "cell", rounds = 2)
    Ivf.writeIndex(index, cents, "cell", path)
    // unique-text chunks self-retrieve at cosine ~1 (the RagPipelineSpec
    // property, now driven through the production interface)
    val probes = chunks.groupBy("chunk_text")
      .agg(count(lit(1)).as("n"), first("chunk_id").as("chunk_id"),
        first("e").as("e"))
      .filter(col("n") === 1).limit(3)
      .select(col("chunk_id").as("want_id"), col("e").as("q"))
      .collect()
    assert(probes.length == 3)
    probes.foreach { r =>
      val q = Seq(r.getSeq[Double](1)).toDF("q")
      val hit = Ivf.probeIndexed(
        spark, path, q, "chunk_id", "e", "cell", nprobe = 2, k = 1).head()
      assert(hit.getLong(0) == r.getLong(0), s"self-retrieval missed: $hit")
      assert(math.abs(hit.getDouble(2) - 1.0) < 1e-6)
    }
  }
}
