package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, IncrementalAgg, Intervals, Layout, Packing, Profile, Rolling, Sampling, Scd2}

/** Round-4 sweep operators: incremental aggregate maintenance,
  * inter-arrival statistics.
  */
class Round4OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("IncrementalAgg: merge of any batch grouping equals the full rollup") {
    val df = Seq(
      ("a", 1, 10L), ("a", 1, 20L), ("a", 2, -5L),
      ("b", 1, 7L), ("b", 1, 3L), ("b", 2, 100L), ("a", 2, 0L))
      .toDF("k1", "k2", "vm").withColumn("id", monotonically_increasing_id())
    val keys = Seq("k1", "k2")
    val full = IncrementalAgg.rollup(df, keys, col("vm"))

    // three uneven batches, merged two different ways
    val b = (0 until 3).map(i => df.filter(pmod(col("id"), lit(3)) === i))
    val r = b.map(IncrementalAgg.rollup(_, keys, col("vm")))
    val leftFold = IncrementalAgg.merge(IncrementalAgg.merge(r(0), r(1), keys), r(2), keys)
    val skewed = IncrementalAgg.merge(r(0), IncrementalAgg.merge(r(1), r(2), keys), keys)

    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(leftFold) === rows(full))
    assert(rows(skewed) === rows(full))

    // empty delta is the merge identity
    val empty = IncrementalAgg.rollup(df.limit(0), keys, col("vm"))
    assert(rows(IncrementalAgg.merge(full, empty, keys)) === rows(full))
  }

  test("interArrival: gaps per key, tiebreak on same-instant, group by arriving type") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", 1L, "x"),
      (1, "2024-01-01 00:00:10", 2L, "y"),   // gap 10s, arrives as y
      (1, "2024-01-01 00:00:10", 3L, "x"),   // same instant: gap 0, after id 2
      (2, "2024-01-01 00:01:00", 4L, "x"),   // first event of key 2: no gap
      (2, "2024-01-01 00:01:30", 5L, "x"))   // gap 30s
      .toDF("k", "tss", "id", "typ")
      .withColumn("t", to_timestamp(col("tss")))
    val out = Rolling.interArrival(df, "k", "t", "id", "typ")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // x: gaps {0 (id3 after id2), 30s (id5 after id4)}
    assert(out("x") === ((2L, 30000000L, 30000000L, 15000000L)))
    // y: one 10s gap
    assert(out("y") === ((1L, 10000000L, 10000000L, 10000000L)))
  }

  test("chunkDocs: tiling, overlap, trailing partial, token coverage") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    // chunk 4, stride 3: starts 0,3,6,9 -> lengths 4,4,4,1
    val out = Packing.chunkDocs(df, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(d1.head._4 === "t1 t2 t3 t4")
    assert(d1(1)._4 === "t4 t5 t6 t7") // overlap of 1 token
    assert(d1.last._4 === "t10")
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 1L, "solo")))
    // stride == chunk tiles with no overlap: every token exactly once
    val tiled = Packing.chunkDocs(df.filter($"doc_id" === 1), "doc_id", "text", 3, 3)
      .agg(sum("n_tokens_chunk")).collect()(0).getLong(0)
    assert(tiled === 10L)
  }

  test("weightedCap: heavier rows draw earlier; zero-weight rows excluded") {
    val df = (1 to 40).map(i => (i.toLong, "s", if (i % 2 == 0) 1000000L else 1L))
      .toDF("id", "stratum", "w")
      .union(Seq((99L, "s", 0L)).toDF("id", "stratum", "w"))
    val kept = Sampling.weightedCap(df, "id", Seq("stratum"), "w", cap = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(99L))
    // heavy rows (even ids, 10^6x weight) should dominate the draw
    assert(kept.count(_ % 2 == 0) >= 9)
    // deterministic: second evaluation draws the identical set
    val again = Sampling.weightedCap(df, "id", Seq("stratum"), "w", cap = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept)
  }

  test("dailySnapshots: containment per day, D windows emit nothing") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "u")
    val hist = Seq(
      // key 1: v1 [Jan1, Jan3), v2 [Jan3, open)
      (1, "a", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:00:00"),
       ts("2025-01-03 00:00:00"), "I", false),
      (1, "b", ts("2025-01-03 00:00:00"), ts("2025-01-03 00:00:00"),
       ts("2999-12-31 23:59:59"), "U", true),
      // key 2: alive [Jan1, Jan2), deleted [Jan2, open)
      (2, "x", ts("2025-01-01 00:00:00"), ts("2025-01-01 00:00:00"),
       ts("2025-01-02 00:00:00"), "I", false),
      (2, "x", ts("2025-01-02 00:00:00"), ts("2025-01-02 00:00:00"),
       ts("2999-12-31 23:59:59"), "D", true))
      .toDF("k", "v", "u", "_valid_from", "_valid_to", "_change_type", "_is_current")
    val out = Scd2.dailySnapshots(hist,
        ts("2025-01-01 00:00:00"), ts("2025-01-04 00:00:00"), cfg)
      .select(col("snapshot_ts"), col("k"), col("v")).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getString(2)))
      .toSet
    assert(out === Set(
      ("2025-01-01", 1, "a"), ("2025-01-02", 1, "a"),
      ("2025-01-03", 1, "b"), ("2025-01-04", 1, "b"),
      ("2025-01-01", 2, "x"))) // Jan2+ deleted: no rows
  }

  test("bloom prune: no false negatives, actually prunes, empty dim prunes all") {
    val fact = (1L to 2000L).map(i => (i, i * 2)).toDF("fk", "payload")
    val dim = Seq(10L, 20L, 30L, 999L).toDF("dk")
    val pruned = BloomPrune.pruned(fact, dim, "fk", "dk", expectedItems = 100L)
    val keys = pruned.select("fk").collect().map(_.getLong(0)).toSet
    assert(Set(10L, 20L, 30L, 999L).subsetOf(keys)) // every true match survives
    assert(keys.size < 200) // and ~99% of the 2000 fact rows are gone
    // verify-join after the prune equals the plain semi join
    val exact = fact.join(dim, $"fk" === $"dk", "left_semi")
      .collect().map(_.getLong(0)).toSet
    val verified = pruned.join(dim, $"fk" === $"dk", "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(verified === exact)
    assert(BloomPrune.pruned(fact, dim.filter($"dk" < 0), "fk", "dk").count() === 0)
  }

  test("islands: abutting and overlapping merge, strict gaps split") {
    val df = Seq(
      // key 1: [0,10) + [10,20) abut -> one island; [25,30) gap -> second
      (1, 0L, 10L), (1, 10L, 20L), (1, 25L, 30L),
      // key 2: overlap [0,15) + [5,12) and containment [1,3) -> one island
      (2, 0L, 15L), (2, 5L, 12L), (2, 1L, 3L))
      .toDF("k", "f0", "t0")
      .select($"k", timestamp_micros($"f0").as("f"), timestamp_micros($"t0").as("t"))
    val out = Intervals.islands(df, Seq("k"), "f", "t")
      .select($"k", $"island_id", unix_micros($"island_from"),
              unix_micros($"island_to"), $"n_intervals")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out === Set((1, 1L, 0L, 20L, 2L), (1, 2L, 25L, 30L, 1L),
                       (2, 1L, 0L, 15L, 3L)))
  }

  test("keepLastVersions: per-key top-k by window start, current always kept") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "u")
    val hist = Scd2.initialLoad(
      Seq((1, "a", ts("2025-01-01 00:00:00")),
          (1, "b", ts("2025-01-02 00:00:00")),
          (1, "c", ts("2025-01-03 00:00:00")),
          (2, "x", ts("2025-01-01 00:00:00")))
        .toDF("k", "v", "u"), cfg)
    val kept = Scd2.keepLastVersions(hist, 2, cfg)
      .select("k", "v", "_is_current").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(kept === Set((1, "b", false), (1, "c", true), (2, "x", true)))
  }

  test("winsorize: values clamp to the exact rank-selection bounds") {
    // group g: 1..100 -> p5 value = 5, p95 value = 95
    val df = (1L to 100L).map(v => ("g", v, v)).toDF("grp", "id", "vm")
    val out = Profile.winsorize(df, "grp", "vm", 5, 95)
      .select("id", "vm_w").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 5L && out(4L) === 5L && out(5L) === 5L)
    assert(out(50L) === 50L)
    assert(out(95L) === 95L && out(96L) === 95L && out(100L) === 95L)
  }

  test("keySkew: heaviest keys first, ppm shares and skew ratio") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(10)("cold"))
      .toDF("k")
    val out = Profile.keySkew(df, Seq("k"), topK = 2)
      .select("k", "n_rows", "share_ppm", "skew_x_avg_ppm", "skew_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.map(t => (t._1, t._5)).toSet === Set(("hot", 1), ("warm", 2)))
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 === 60L && hot._3 === 600000L)
    assert(hot._4 === 1800000L) // 60 rows vs avg 33.3: 1.8x in ppm
  }

  test("zValue interleaves bits; zorderWrite yields disjoint sorted z ranges") {
    // x=5 (101), y=3 (011): bits -> 1 + 2 + 8 + 16 = 27
    val one = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue("x", "y", 3).as("z")).collect()(0).getLong(0)
    assert(one === 27L)

    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val parts = Layout.zorderWrite(grid, "x", "y", bits = 5, numFiles = 8)
      .select("_z").rdd
      .mapPartitions(it => {
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.min, zs.max, zs == zs.sorted))
      }).collect().sortBy(_._1)
    assert(parts.forall(_._3), "each file sorted by z")
    assert(parts.sliding(2).forall {
      case Array((_, hi, _), (lo, _, _)) => hi < lo
      case _ => true
    }, "file z ranges disjoint")
  }
}
