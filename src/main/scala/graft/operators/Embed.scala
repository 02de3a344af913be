package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The PRODUCTION embedding interface behind the RAG path's hash-stub
  * (QueriesLLM.hashEmbed / q_chunk_embed): a batch contract a real
  * model binding implements — ONNX session, Triton/TEI client, or any
  * model-server RPC — and the Spark-side plumbing that drives it.
  *
  * This is the declared SWAP POINT: the pipeline
  * (chunk → [[Embed.withEmbeddings]] → [[Ivf]] build/append → probe)
  * never names a model; it names an [[Embedder]]. Swapping the
  * deterministic [[HashEmbedder]] fake for a real encoder is a
  * one-binding change at the call site — nothing downstream moves,
  * because everything downstream consumes the same
  * `array<double>` column (a float32 model binding widens at this
  * boundary; [[EmbedContractSpec]] drives the full chain through the
  * fake to pin that the composition holds).
  *
  * Batch contract:
  *  - `embed(texts)` receives at most `batchSize` texts per call
  *    (the model-server max-batch knob) and MUST return exactly one
  *    `dim`-length vector per input, in input order — violations
  *    fail the task rather than silently misaligning rows.
  *  - Calls happen executor-side, once per partition-batch: the
  *    embedder is serialized to executors, so a real binding should
  *    hold its session/channel in a lazy transient field.
  *  - Texts must be non-null (enforce upstream; a null text is a
  *    pipeline bug, not an embeddable value).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(texts: Seq[String]): Seq[Array[Double]]
}

/** Deterministic fake with [[graft.QueriesLLM.hashEmbed]]'s EXACT
  * arithmetic, JVM-side: component i = int(first 6 hex of
  * md5(s"$text:$i")) / 2^24 · 2 − 1, then L2-normalize. Same md5,
  * same parse, same IEEE operation order ⇒ bit-identical doubles to
  * the SQL expression — the spec asserts exact equality, which pins
  * the mapPartitions plumbing AND keeps the fake hash-checkable by
  * the same oracles as the stub column. */
final case class HashEmbedder(dim: Int) extends Embedder {
  def embed(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = Array.tabulate(dim) { i =>
      val h = md.digest((t + ":" + i).getBytes("UTF-8"))
      md.reset()
      val v = ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
      v.toDouble / 16777216.0 * 2 - 1
    }
    // foldLeft sum = the SQL aggregate's left-to-right accumulation
    val norm = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x * x))
    raw.map(_ / norm)
  }
}

/** [[HashEmbedder]] with a deterministic per-DOCUMENT cost charge (an
  * LCG spin of `spinPerDoc` iterations before the hash arithmetic) —
  * the measurement stand-in the free md5 fake cannot provide: a real
  * encoder bills per document, so serving-path economics (an index
  * probe re-embeds only candidates; the brute baseline re-embeds the
  * corpus per query batch) only become visible when embedding carries
  * a per-text cost. Output vectors are BIT-IDENTICAL to
  * [[HashEmbedder]]'s — the spin feeds a guard that cannot fire — so
  * costed and free embedders are interchangeable across any
  * index/probe pair (an index built with one serves re-ranks under
  * the other). Used by the `hybrid_dense_costed` Sweep case; never on
  * a registry path. */
final case class CostedEmbedder(dim: Int, spinPerDoc: Int) extends Embedder {
  private val inner = HashEmbedder(dim)
  def embed(texts: Seq[String]): Seq[Array[Double]] = {
    texts.foreach { t =>
      var acc = t.length.toLong
      var i = 0
      while (i < spinPerDoc) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      // data-dependent sink so the JIT cannot eliminate the spin
      require(acc != Long.MinValue + 1L, "unreachable")
    }
    inner.embed(texts)
  }
}

object Embed {

  /** Appends `outCol` (`array<double>`, length `embedder.dim`) to
    * every row of `df` by batching `textCol` values through
    * `embedder.embed` — the mapPartitions shape a model server wants:
    * one RPC per `batchSize` texts, carry columns pass through
    * untouched, output order = input order within each partition.
    *
    * Scale shape: embarrassingly parallel, NO shuffle — each
    * partition drives its own model session; `batchSize` is the
    * GPU/server max-batch, and partition count (set upstream) is the
    * concurrency knob. The output column feeds [[Ivf]] /
    * [[IvfPq]] / dedup_embedding unchanged. */
  def withEmbeddings(df: DataFrame, textCol: String, outCol: String,
      embedder: Embedder, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(!df.columns.contains(outCol), s"output column $outCol exists")
    val schema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val dim = embedder.dim
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = embedder.embed(batch.map(_.getString(textIdx)))
        require(embs.length == batch.length,
          s"embedder returned ${embs.length} vectors for ${batch.length} texts")
        batch.iterator.zip(embs.iterator).map { case (row, e) =>
          require(e.length == dim,
            s"embedder returned dim ${e.length}, declared $dim")
          Row.fromSeq(row.toSeq :+ e.toIndexedSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
