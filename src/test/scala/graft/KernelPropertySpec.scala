package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.plans.{AsOfProbeIndex, BitmapAndCount, BitmapOr, LongBitmap}

/** Randomized property tests for the pure-JVM kernels inside the
  * custom operators — no Spark session needed, so these pin the
  * algebra the distributed specs build on: bitmap set semantics and
  * the as-of floor/ceiling probe vs naive linear scans. (Plain
  * ScalaCheck Gen + fixed seeds — scalatestplus isn't on the offline
  * classpath.) */
class KernelPropertySpec extends AnyFunSuite {

  private val idsGen: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(0L, 1L << 20))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def mk(xs: List[Long]): LongBitmap = {
    val m = new LongBitmap(); xs.foreach(m.set); m
  }

  test("bitmap cardinality == distinct count; serialization round-trips") {
    (1 to 50).foreach { i =>
      val ids = sample(idsGen, i.toLong)
      val bm = mk(ids)
      assert(bm.cardinality == ids.distinct.size, s"seed $i")
      assert(LongBitmap.fromBytes(bm.toBytes).cardinality == bm.cardinality, s"seed $i")
    }
  }

  test("bitmap OR == set union; AND count == intersection size") {
    (1 to 50).foreach { i =>
      val a = sample(idsGen, i.toLong)
      val b = sample(idsGen, (i + 1000).toLong)
      val union = BitmapOr.or(mk(a).toBytes, mk(b).toBytes)
      val inter = BitmapAndCount.andCount(mk(a).toBytes, mk(b).toBytes)
      assert(LongBitmap.fromBytes(union).cardinality == (a.toSet ++ b.toSet).size, s"seed $i")
      assert(inter == (a.toSet & b.toSet).size, s"seed $i")
    }
  }

  test("bitmap OR is idempotent and commutative (the streaming-sink contract)") {
    (1 to 50).foreach { i =>
      val a = sample(idsGen, i.toLong)
      val b = sample(idsGen, (i + 2000).toLong)
      val ab = BitmapOr.or(mk(a).toBytes, mk(b).toBytes)
      val abReplay = BitmapOr.or(ab, mk(b).toBytes)
      val ba = BitmapOr.or(mk(b).toBytes, mk(a).toBytes)
      // serialization is byte-deterministic (sorted chunks), so replay
      // idempotence is literal byte equality of the serialized forms
      assert(java.util.Arrays.equals(abReplay, ab), s"seed $i")
      assert(LongBitmap.fromBytes(ba).cardinality ==
        LongBitmap.fromBytes(ab).cardinality, s"seed $i")
    }
  }

  test("legacy flat bitmap buffers still load (negative format tag discriminates)") {
    // hand-roll the pre-chunk (nWords, words...) layout a persisted
    // H11 bitmap table would hold, and check it decodes and OR-merges
    // with the chunked format
    val ids = List(1L, 64L, 100000L)
    val nWords = (100000L >>> 6).toInt + 1
    val words = new Array[Long](nWords)
    ids.foreach(id => words((id >>> 6).toInt) |= 1L << (id & 63))
    val bb = java.nio.ByteBuffer.allocate(4 + nWords * 8)
    bb.putInt(nWords); words.foreach(bb.putLong)
    val legacy = bb.array()
    assert(LongBitmap.fromBytes(legacy).cardinality == 3)
    val merged = BitmapOr.or(legacy, mk(List(7L, 64L)).toBytes)
    assert(LongBitmap.fromBytes(merged).cardinality == 4)
    assert(BitmapAndCount.andCount(legacy, mk(List(64L, 9L)).toBytes) == 1)
  }

  test("chunked bitmap: sharded/offset id clusters cost per-cluster, stay exact") {
    // 10 id clusters separated by 2^40 — the sharded-surrogate layout
    // (region/tenant id blocks, or a scale-replica's offsets) that the
    // flat max-id-sized bitset could not represent at all
    val ids = (0 until 1000).map(i => (i % 10) * (1L << 40) + i.toLong)
    val bm = new LongBitmap()
    ids.foreach(bm.set)
    assert(bm.cardinality == ids.distinct.size)
    val bytes = bm.toBytes
    // memory tracks touched 64Ki-chunks (<=2 per cluster), not max id
    assert(bytes.length <= 4 + 20 * (8 + 8 * 1024),
      s"serialized ${bytes.length} bytes — must be per-cluster, not per-max-id")
    assert(LongBitmap.fromBytes(bytes).cardinality == bm.cardinality)
    // AND across half-overlapping cluster sets stays exact
    val other = new LongBitmap()
    ids.filter(_ % 2 == 0).foreach(other.set)
    assert(BitmapAndCount.andCount(bytes, other.toBytes) ==
      ids.distinct.count(_ % 2 == 0))
  }

  test("AsOfIndexCache: concurrent probers share ONE build per key; keys isolate") {
    // 32 threads race the same (broadcast id, fingerprint): exactly
    // one build must run and everyone must get the same instance —
    // the per-executor contract that replaced the per-task build
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    try {
      val tasks = (1 to 64).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef =
            graft.plans.AsOfIndexCache.getOrBuild(999999L, Integer.valueOf(42), () => {
              builds.incrementAndGet()
              Thread.sleep(20) // widen the race window
              new Object
            })
        })
      }
      val got = tasks.map(_.get())
      assert(builds.get() == 1, s"expected one build, got ${builds.get()}")
      assert(got.distinct.size == 1, "all callers must share the same instance")
      // a different fingerprint on the same broadcast id is a new key
      val other = graft.plans.AsOfIndexCache.getOrBuild(999999L, Integer.valueOf(43),
        () => new Object)
      assert(!(other eq got.head))
    } finally pool.shutdown()
  }

  test("as-of probe == naive linear floor/ceiling scan on random time sets") {
    val timesGen = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)
    val proj = UnsafeProjection.create(Array[DataType](LongType))
    (1 to 80).foreach { i =>
      val times = sample(timesGen, i.toLong)
      val t = sample(Gen.chooseNum(-1100L, 1100L), (i + 500).toLong)
      val fwd = i % 2 == 0
      // each row carries its own time, so the probe result is checkable
      val rows = times.map(x => proj(InternalRow(x)).copy()).toArray
      val map = new java.util.HashMap[AnyRef, (Array[Long], Array[UnsafeRow])]()
      map.put(java.lang.Long.valueOf(1L), (times.toArray, rows))
      val idx = new AsOfProbeIndex(map, fwd)
      val got = Option(idx.probe(1L, t)).map(_.getLong(0))
      val want =
        if (fwd) times.find(_ >= t)
        else times.reverse.find(_ <= t)
      assert(got == want, s"seed $i fwd=$fwd t=$t times=$times")
      assert(idx.probe(2L, t) == null, "absent key")
    }
  }
}
