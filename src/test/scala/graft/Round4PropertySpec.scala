package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, Intervals, Packing, Sampling, Snapshot}

/** Property-style checks (seeded, reproducible) for the round-4 operators:
  * merge algebra under random batchings, island coverage invariants,
  * partitioning-invariant sampling, chunk reconstruction, and the SCD
  * invariant suite over snapshot-strategy output.
  */
class Round4PropertySpec extends SparkTestBase {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("incremental rollup: any random batching + merge tree == full rollup") {
    val rnd = new Random(42)
    val data = (1 to 300).map(_ =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(4), rnd.nextLong() % 1000000))
    val df = data.toDF("k1", "k2", "vm").withColumn("id", monotonically_increasing_id())
    val keys = Seq("k1", "k2")
    val full = IncrementalAgg.rollup(df, keys, col("vm"))
    for (trial <- 0 until 3) {
      val nBatches = 2 + rnd.nextInt(4)
      val parts = (0 until nBatches).map(i =>
        IncrementalAgg.rollup(df.filter(pmod(col("id"), lit(nBatches)) === i),
                              keys, col("vm")))
      // random merge tree: left fold over a shuffled order
      val order = rnd.shuffle(parts.toList)
      val merged = order.reduce(IncrementalAgg.merge(_, _, keys))
      assert(rows(merged) === rows(full), s"trial $trial, $nBatches batches")
    }
  }

  test("islands: disjoint, gap-separated, and covering exactly the input intervals") {
    val rnd = new Random(1337)
    val ivs = (1 to 200).map { i =>
      val k = rnd.nextInt(10)
      val from = rnd.nextInt(1000).toLong
      val len = 1L + rnd.nextInt(50)
      (k, i.toLong, from, from + len)
    }
    val df = ivs.toDF("k", "iv_id", "f0", "t0")
      .select($"k", $"iv_id", timestamp_micros($"f0").as("f"),
              timestamp_micros($"t0").as("t"))
    val isl = Intervals.islands(df, Seq("k"), "f", "t")
      .select($"k", $"island_id", unix_micros($"island_from").as("lo"),
              unix_micros($"island_to").as("hi"), $"n_intervals")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // member counts add up
    assert(isl.map(_._5).sum === 200L)
    // islands per key are disjoint AND separated by a strict gap
    isl.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3, s"islands touch: $a $b")
        case _ =>
      }
    }
    // every interval is contained in exactly one island of its key
    val byKey = isl.groupBy(_._1)
    ivs.foreach { case (k, _, f, t) =>
      val containing = byKey(k).filter(i => i._3 <= f && t <= i._4)
      assert(containing.length === 1, s"interval ($k,$f,$t) in ${containing.length} islands")
    }
  }

  test("weightedCap: drawn set invariant under repartitioning and input order") {
    val rnd = new Random(7)
    val df = (1 to 500).map(i => (i.toLong, s"s${i % 3}", 1L + rnd.nextInt(1000)))
      .toDF("id", "stratum", "w")
    def drawn(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedCap(d, "id", Seq("stratum"), "w", cap = 15)
        .select("stratum", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val base = drawn(df)
    assert(drawn(df.repartition(7)) === base)
    assert(drawn(df.orderBy($"w".desc)) === base)
    assert(base.groupBy(_._1).forall(_._2.size == 15))
  }

  test("chunkDocs: stride-prefixes + final chunk reconstruct every document") {
    val rnd = new Random(99)
    val docs = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i, (1 to n).map(j => s"w${rnd.nextInt(50)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val (c, s) = (7, 5)
    val chunks = Packing.chunkDocs(df, "doc_id", "text", c, s)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens_chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      val cs = chunks(id).sortBy(_._2)
      // every chunk's token count is as declared and text slices line up
      cs.foreach { case (_, cid, ct, nt) =>
        val start = (cid * s).toInt
        assert(ct === toks.slice(start, start + c).mkString(" "))
        assert(nt === math.min(c, toks.length - start).toLong)
      }
      // stride-prefix of each non-final chunk + the whole final chunk
      val rebuilt = cs.init.map(_._3.split(" ").take(s).mkString(" ")) :+ cs.last._3
      assert(rebuilt.mkString(" ") === toks.mkString(" "))
    }
  }

  test("snapshot-strategy output satisfies the full SCD invariant suite") {
    val cfg = ScdConfig(uniqueKey = Seq("id"), updatedAtCol = "_snapshot_at",
                        changeInclude = Some(Seq("status")),
                        deletedAtCol = Some("deleted_at"))
    val rnd = new Random(5)
    val ids = (1 to 30).toSeq
    var target: Option[org.apache.spark.sql.DataFrame] = None
    for (run <- 1 to 4) {
      val present = ids.filter(_ => rnd.nextDouble() > 0.2)
      val snap = present.map(i => (i, s"st${rnd.nextInt(3)}")).toDF("id", "status")
      val out = Snapshot.run(target, snap,
        ts(f"2025-01-0$run 00:00:00"), cfg, invalidateHardDeletes = true)
      target = Some(out.localCheckpoint())
    }
    val violations = ScdInvariants.checkAll(target.get, cfg)
    assert(violations.forall(_._2 == 0L), s"violations: $violations")
  }

  test("cellRank == naive row_number window: 200 random cases x microBins {1,2,10,10000}") {
    import org.apache.spark.sql.expressions.Window
    // 50 independent random datasets per microBins value (200 cases total),
    // batched into ONE comparison each by making case_id part of the group
    // key — bit-equality must hold per (case, group) regardless of how the
    // global value->cell map bins OTHER cases' values. Heavy ties (values
    // snapped to a coarse grid), negatives, singleton groups, and 1-row
    // datasets all occur by construction.
    def cases(seed: Int) = {
      val rnd = new Random(seed)
      val rows = for {
        c <- 0 until 50
        g <- 0 to rnd.nextInt(4)
        _ <- 0 to rnd.nextInt(30)
      } yield (c, s"g$g",
               math.floor(rnd.nextGaussian() * 400) / 4.0, // gridded: many ties
               rnd.nextLong())
      rows.toDF("case_id", "grp", "v", "tie")
    }
    val grp = Seq("case_id", "grp")
    val outCols = Seq("case_id", "grp", "v", "tie", "_rank", "_n")
    def naive(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(grp.map(col): _*).orderBy(col("v"), col("tie"))
      df.withColumn("_rank", row_number().over(w).cast("long"))
        .withColumn("_n",
                    count(lit(1)).over(Window.partitionBy(grp.map(col): _*)))
        .select(outCols.map(col): _*)
    }
    for (mb <- Seq(1, 2, 10, 10000)) {
      val df = cases(1000 + mb)
      val got = graft.operators.Profile
        .cellRank(df, grp, "v", Seq("tie"), microBins = mb)
        .select(outCols.map(col): _*)
      assert(rows(got) === rows(naive(df)), s"microBins=$mb")
    }
    // degenerate bounds: every value identical (mx == mn -> all rows cell 0)
    val const = (1 to 40).map(i => (i % 3, "g", 7.5, i.toLong))
      .toDF("case_id", "grp", "v", "tie")
    for (mb <- Seq(1, 10000)) {
      val got = graft.operators.Profile
        .cellRank(const, grp, "v", Seq("tie"), microBins = mb)
        .select(outCols.map(col): _*)
      assert(rows(got) === rows(naive(const)), s"const microBins=$mb")
    }
  }
}
