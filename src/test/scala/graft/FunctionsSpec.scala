package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    ).toDF("a", "b")
      .select(round(VectorFunctions.cosine(col("a"), col("b")), 9).as("c"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }

  test("hyperplane bucket is deterministic and groups identical vectors") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(1.0, 2.0, 3.0)),
      (3L, Seq(-9.0, 4.0, -7.0))
    ).toDF("id", "v").select(col("id"), VectorFunctions.hyperplaneBucket(col("v"), 4).as("b"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m.values.forall(b => b >= 0 && b < 16))
  }

  test("token/word counts and fingerprint are stable") {
    val df = Seq("the cat sat, on the mat!").toDF("text").select(
      TextFunctions.wsTokenCount(col("text")).as("ws"),
      TextFunctions.wordCount(col("text")).as("w"),
      TextFunctions.punctCount(col("text")).as("p"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val r = df.collect().head
    assert(r.getAs[Long]("ws") == 6)
    assert(r.getAs[Long]("w") == 6)
    assert(r.getAs[Long]("p") == 2)
    // ground truth computed independently: polynomial 31-hash mod 2^31-1
    val expected = "the cat sat, on the mat!".foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    assert(r.getAs[Long]("fp") == expected)
  }

  test("langId votes with deterministic priority") {
    val df = Seq(
      "the cat of the house is big",
      "el perro de la casa que ladra y en",
      "zzz qqq www"
    ).toDF("text").select(TextFunctions.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und"))
  }

  test("minhash: near-identical docs collide in some band; disjoint docs get low jaccard") {
    val base = "spark catalyst tungsten shuffle partition broadcast join aggregate window stream"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),              // near-dup of 1
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.shingles("text", 5).as("grams"))
      .withColumn("sig", HashFunctions.minhashSignature(col("grams"), 32))
      .withColumn("bands", HashFunctions.lshBands(col("sig"), 8, 4))
    val pairs = HashFunctions.bucketedPairs(
      docs.select(col("doc_id"), col("bands")), "doc_id", "bands")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dups must share a band; got $pairs")
    assert(!pairs.contains((1L, 3L)) || !pairs.contains((2L, 3L)))
  }

  test("bulk simhashes match the per-row closed form bit-for-bit") {
    val texts = Seq(
      (1L, "spark catalyst tungsten shuffle partition broadcast join"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez"),
      (4L, "a"), // single token: every vote is ±1, exercises ties
      (5L, ("tok " * 300).trim) // 300 copies of one token: lane counts > 255
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val bulk = HashFunctions.simhashes(texts, "doc_id", "toks")
      .as[(Long, Long)].collect().toMap
    val closed = texts
      .select(col("doc_id"), HashFunctions.simhash(col("toks")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(bulk == closed, s"bulk $bulk vs closed-form $closed")
  }

  test("simhashChunks pigeonhole guarantee and the 4-vs-8-chunk recall band") {
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((x, b) => x ^ (1L << b))
    val base = 0x0123456789abcdefL
    def pairs(df: org.apache.spark.sql.DataFrame, n: Int): Set[(Long, Long)] =
      HashFunctions.bucketedPairs(
          df.withColumn("chunks", HashFunctions.simhashChunks(col("simhash"), n)),
          "doc_id", "chunks")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // hamming-5 pair touching ALL four 16-bit chunks but only 5 of the
    // 8-bit chunks: invisible to the default chunking, guaranteed at 8
    val tricky = Seq(
      (1L, base), (2L, flip(base, Seq(1, 9, 17, 33, 49)))).toDF("doc_id", "simhash")
    assert(!pairs(tricky, 4).contains((1L, 2L)),
      "hamming 5 with no clean 16-bit chunk must be outside the 4-chunk guarantee")
    assert(pairs(tricky, 8).contains((1L, 2L)),
      "8 chunks guarantee hamming ≤ 7")
    // property: ANY pair within hamming ≤ nChunks-1 is a candidate
    val rng = new scala.util.Random(7)
    val planted = (0 until 40).map { i =>
      val h = rng.nextLong()
      val d = 1 + rng.nextInt(7) // hamming 1..7
      val bits = rng.shuffle((0 until 64).toList).take(d)
      (2L * i, h, 2L * i + 1, flip(h, bits))
    }
    val df = planted.flatMap { case (ia, ha, ib, hb) => Seq((ia, ha), (ib, hb)) }
      .toDF("doc_id", "simhash")
    val found = pairs(df, 8)
    planted.foreach { case (ia, _, ib, _) =>
      assert(found.contains((ia, ib)), s"planted pair ($ia,$ib) missed at 8 chunks")
    }
  }

  test("simhash token cap truncates identically in both forms") {
    // cap-parameterized with cap=4 so the over-cap path is exercised
    // without 65k-token rows: tokens past the cap are hash-heavy
    // repeats that WOULD flip bits if either form counted them
    val texts = Seq(
      (1L, "alpha beta gamma delta zzz zzz zzz zzz zzz zzz"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val bulk = HashFunctions.simhashesCapped(texts, "doc_id", "toks", 4)
      .as[(Long, Long)].collect().toMap
    val closed = texts
      .select(col("doc_id"), HashFunctions.simhashCapped(col("toks"), 4).as("h"))
      .as[(Long, Long)].collect().toMap
    val prefix = texts
      .select(col("doc_id"),
        HashFunctions.simhashCapped(slice(col("toks"), 1, 4), 1 << 20).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(bulk == closed, s"bulk $bulk vs capped closed form $closed")
    assert(closed == prefix, "capping ≡ hashing the prefix array")
    // the cap is real: counting doc 1's dominant tail changes the hash
    val full = texts
      .select(col("doc_id"), HashFunctions.simhashCapped(col("toks"), 1 << 20).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(full(1L) != closed(1L), "tail tokens beyond the cap must be ignored")
  }

  test("bulk minhash signatures match the per-row closed form") {
    val texts = Seq(
      (1L, "spark catalyst tungsten shuffle partition broadcast join"),
      (2L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.shingles("text", 5).as("grams"))
    val bulk = HashFunctions.minhashSignatures(texts, "doc_id", "grams", 16)
      .as[(Long, Seq[Long])].collect().toMap
    val closed = texts
      .select(col("doc_id"), HashFunctions.minhashSignature(col("grams"), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(bulk == closed)
  }

  test("text-direct minhash equals the shingle-array form") {
    val texts = Seq(
      (1L, "spark catalyst tungsten shuffle partition broadcast join"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "abc") // shorter than the shingle width
    ).toDF("doc_id", "text")
    val direct = HashFunctions.minhashSignaturesText(texts, "doc_id", "text", 5, 16)
      .as[(Long, Seq[Long])].collect().toMap
    val viaArrays = HashFunctions.minhashSignatures(
      texts.select(col("doc_id"), TextFunctions.shingles("text", 5).as("grams")),
      "doc_id", "grams", 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(direct == viaArrays)
  }

  test("simhash: hamming(near-dups) < hamming(unrelated)") {
    val base = "spark catalyst tungsten shuffle partition broadcast join aggregate window stream"
    val df = Seq(
      (1L, base), (2L, base + " extra"),
      (3L, "totally different unrelated words appear in this document body")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        HashFunctions.simhash(TextFunctions.tokens(col("text"))).as("h"))
    val m = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
    assert(ham(m(1L), m(2L)) <= 12)
  }
}
