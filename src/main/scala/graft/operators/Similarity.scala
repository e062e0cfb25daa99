package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers:
  *  - `bruteForceTopK` — exact cosine top-k; the correctness baseline. The
  *    (small) query side is broadcast, so the corpus scan is shuffle-free and
  *    embarrassingly parallel: at 100 TB it is one pass over the corpus with a
  *    per-partition top-k (the window collapses to a final top-k per query).
  *  - `lshTopK` — sign-random-projection LSH: corpus is bucketed by the sign
  *    pattern of `planes` deterministic hyperplanes; a query searches only its
  *    bucket. Sub-linear in corpus size; recall traded for speed.
  *  - `ivfTopK` — inverted-file: corpus assigned to the nearest of C coarse
  *    centroids; a query probes `nprobe` nearest centroids only.
  *
  * All pseudo-randomness (hyperplanes) derives from md5 so the DuckDB oracle
  * reproduces bucket assignments exactly. Cosines are computed in double with
  * a sequential left-to-right fold (bit-reproducible across engines) and
  * rounded to 4 decimals in outputs.
  */
object Similarity {

  /** Sequential-fold dot product in double precision over `array<float>`.
    * A native codegen'd Catalyst expression (`graft.functions.FloatVecDot`);
    * float-for-float identical to the built-in composition
    * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0D, _+_)`.
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVecDot(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Exact cosine top-k: for each query vector, the `k` nearest corpus
    * vectors. `queries` must be small (it is broadcast).
    */
  def bruteForceTopK(queries: DataFrame,
                     corpus: DataFrame,
                     idCol: String,
                     vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
                           norm2(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
                          norm2(col(vecCol)).as("_cn"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", pairCosine)
    rankTopK(scored, k)
  }

  /** Cosine from pre-computed self-norms `_qn`/`_cn` — one fold per pair
    * instead of three, floating-point-identical to `cosine(a, b)`.
    */
  private def pairCosine: Column =
    dot(col("_qv"), col("_cv")) / sqrt(col("_qn") * col("_cn"))

  /** Deterministic hyperplane component for (plane, dim): uniform-ish in
    * [-1, 1], derived from md5 hex so any engine reproduces it.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"$p-"), d.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 2000001L).cast("double") / 1000000.0 - 1.0

  /** LSH bucket key: the sign pattern of the vector against `planes`
    * deterministic hyperplanes, as a string like "10110100".
    *
    * Native codegen expression (`graft.functions.SignLshBucket`): the
    * hyperplane components are data-independent, so they are precomputed once
    * instead of re-deriving `planes * dim` md5 hashes per row. Bit-identical
    * to `lshBucketSpec` (asserted by `FloatVecDotSpec`).
    */
  def lshBucket(vec: Column, planes: Int): Column =
    graft.functions.SignLshBucket(vec, planes)

  /** The built-in-composition spec `lshBucket` must match bit-for-bit. */
  private[graft] def lshBucketSpec(vec: Column, planes: Int): Column =
    concat_ws("",
      (0 until planes).map { p =>
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
                   (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*)

  /** Approximate top-k via sign-LSH: search only the query's bucket.
    * One equi-join shuffle on the bucket key instead of a full cross product —
    * the scale path when the query side is itself large.
    */
  def lshTopK(queries: DataFrame,
              corpus: DataFrame,
              idCol: String,
              vecCol: String,
              k: Int,
              planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
                           norm2(col(vecCol)).as("_qn"),
                           lshBucket(col(vecCol), planes).as("_bk"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
                          norm2(col(vecCol)).as("_cn"),
                          lshBucket(col(vecCol), planes).as("_bk"))
    val scored = c
      .join(broadcast(q), Seq("_bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", pairCosine)
    rankTopK(scored, k)
  }

  /** IVF coarse centroids: the `c` lowest-id corpus vectors serve as fixed
    * centroids (deterministic "training" — reproducible in the oracle).
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String, c: Int): DataFrame =
    corpus
      .select(col(idCol).as("centroid_id"), col(vecCol).as("_mv"))
      .orderBy(col("centroid_id"))
      .limit(c)

  /** Assign every row of `df` to its `n` nearest centroids by cosine (ties
    * broken by centroid id). Returns (id, centroid_id), one row per probe.
    */
  def ivfAssignN(df: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame, n: Int): DataFrame =
    df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
              norm2(col(vecCol)).as("_vn"))
      .join(broadcast(centroids.withColumn("_mn", norm2(col("_mv")))))
      .withColumn("_sim",
                  dot(col("_v"), col("_mv")) / sqrt(col("_vn") * col("_mn")))
      .withColumn("_rn",
                  row_number().over(Window.partitionBy(col("_id"))
                    .orderBy(col("_sim").desc, col("centroid_id"))))
      .filter(col("_rn") <= n)
      .select(col("_id").as("id"), col("centroid_id"))

  /** Single nearest-centroid assignment (the list a corpus vector lives in). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    ivfAssignN(df, idCol, vecCol, centroids, 1)

  /** Approximate top-k via IVF: probe the query's `nprobe` nearest centroids'
    * inverted lists. Corpus cost per query ∝ nprobe * corpus/c instead of
    * corpus; each corpus vector lives in exactly one list, so probed pairs
    * are already distinct — no dedup shuffle needed.
    */
  def ivfTopK(queries: DataFrame,
              corpus: DataFrame,
              idCol: String,
              vecCol: String,
              k: Int,
              c: Int = 16,
              nprobe: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, c)
    val assign = ivfAssign(corpus, idCol, vecCol, cents)
    val qAssign = ivfAssignN(queries, idCol, vecCol, cents, nprobe)
    val cList = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
              norm2(col(vecCol)).as("_cn"))
      .join(assign.withColumnRenamed("id", "neighbor_id"), Seq("neighbor_id"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
              norm2(col(vecCol)).as("_qn"))
      .join(qAssign.withColumnRenamed("id", "query_id"), Seq("query_id"))
    val scored = cList
      .join(broadcast(q), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", pairCosine)
    rankTopK(scored, k)
  }

  /** One Lloyd (k-means) update step in quantized space: assign every vector
    * to its nearest centroid, then emit per-(centroid, dimension) counts and
    * sums of floor(x*1e6) longs. The caller derives the new centroid as
    * sum_micro / (n * 1e6) — the quantization makes the update
    * order-independent (a float mean would depend on reduction order), so a
    * 1000-executor run reproduces a laptop's centroids bit-for-bit.
    *
    * Scale: broadcast assign (c centroids) + 64x dimension explode into a
    * map-side-combined aggregate on (centroid, dim) — c*dim result rows, one
    * exchange of partial sums.
    */
  def kmeansStep(corpus: DataFrame, idCol: String, vecCol: String,
                 c: Int = 16): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, c)
    val asg = ivfAssign(corpus, idCol, vecCol, cents)
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("_v"))
      .join(asg, Seq("id"))
      .select(col("centroid_id"),
              posexplode(transform(
                col("_v"),
                x => floor(x.cast("double") * lit(1000000.0)).cast("long"))))
      .groupBy(col("centroid_id"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("col")).as("sum_micro"))
  }

  /** Deterministic PQ codebook entry: component `j` of centroid `k` in
    * subspace `s`, an md5-derived integer in [-1000, 1000] (milli-units of
    * the quantized vector space). Computed driver-side with the same md5 the
    * oracle engine uses, so codes agree bit-for-bit.
    */
  private[graft] def pqCentroid(s: Int, k: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"pq-$s-$k-$j".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  /** Product-quantization code assignment: the vector is split into `m`
    * subvectors; each is assigned the nearest of `k` fixed codebook centroids
    * by squared L2 distance in integer milli-space (`floor(x*1000)`), ties to
    * the smallest code. Output: one row per (vector, subspace) with the code
    * and its distance — the PQ code table that makes IVF-PQ search feasible
    * at 100 TB (memory per vector drops from `dim * 4` bytes to `m` bytes).
    *
    * Scale: the codebook is `m*k*dim/m` driver-computed literals folded into
    * the projection — no join, no shuffle, whole-stage codegen; the only
    * exchange is whatever the caller does with the codes. Distances and
    * centroids are integers, so assignment is engine-exact (a float L2 would
    * tie-break differently across fma/simd paths).
    */
  def pqAssign(corpus: DataFrame,
               idCol: String,
               vecCol: String,
               dim: Int = 64,
               m: Int = 4,
               k: Int = 16): DataFrame =
    pqPerSub(corpus, idCol, vecCol, dim, m, k)
      .select(col("vec_id"), col("sub"),
              (array_position(col("_d"), array_min(col("_d"))) - 1)
                .cast("int").as("code"),
              array_min(col("_d")).as("dist2"))

  /** Shared PQ stage: one row per (vector, subspace) carrying the k-wide
    * array of squared distances to every codebook centroid (`_d`).
    *
    * The full m*k distance table comes from ONE native codegen'd pass over
    * the float array (`graft.functions.PqAllDists` — bit-identical to the
    * HOF composition `pqPerSubSpec`, asserted by spec); the per-sub rows are
    * then cheap slices of that long array.
    */
  private def pqPerSub(corpus: DataFrame,
                       idCol: String,
                       vecCol: String,
                       dim: Int,
                       m: Int,
                       k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val all = corpus.select(
      col(idCol).as("vec_id"),
      graft.functions.PqAllDists(col(vecCol), dim, m, k).as("_all"))
    // posexplode_outer: the non-outer generate's implicit size/notnull filter
    // would be pushed below the projection and re-evaluate PqAllDists twice
    // per row (see Dedup.contaminationStats); the m-slice array is never
    // empty, so outer semantics are identical.
    all.select(
      col("vec_id"),
      posexplode_outer(transform(sequence(lit(0), lit(m - 1)),
                                 s => slice(col("_all"), s * k + 1, lit(k))))
        .as(Seq("sub", "_d")))
  }

  /** Built-in-composition spec for [[pqPerSub]]: quantize via `transform`,
    * slice per subspace, distance via `zip_with` against constant-folded
    * centroid literals. Must match `pqPerSub` bit-for-bit (spec-asserted) —
    * kept as the readable contract and the cross-engine formula reference.
    */
  private[graft] def pqPerSubSpec(corpus: DataFrame,
                                  idCol: String,
                                  vecCol: String,
                                  dim: Int,
                                  m: Int,
                                  k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val quantized = corpus.select(
      col(idCol).as("vec_id"),
      transform(col(vecCol),
                x => floor(x.cast("double") * 1000).cast("long")).as("_q"))
    val perSub = quantized.select(
      col("vec_id"),
      posexplode_outer(array((0 until m).map(s =>
        slice(col("_q"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "_sq")))
    val dists = array((0 until k).map { kk =>
      val centsBySub = array((0 until m).map(s =>
        array((0 until subDim).map(j => lit(pqCentroid(s, kk, j))): _*)): _*)
      aggregate(
        zip_with(col("_sq"), element_at(centsBySub, col("sub") + 1),
                 (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, d) => acc + d)
    }: _*)
    perSub.withColumn("_d", dists).select("vec_id", "sub", "_d")
  }

  /** [[pqAssign]] built from the spec composition — parity target for the
    * native-expression path.
    */
  private[graft] def pqAssignSpec(corpus: DataFrame,
                                  idCol: String,
                                  vecCol: String,
                                  dim: Int,
                                  m: Int,
                                  k: Int): DataFrame =
    pqPerSubSpec(corpus, idCol, vecCol, dim, m, k)
      .select(col("vec_id"), col("sub"),
              (array_position(col("_d"), array_min(col("_d"))) - 1)
                .cast("int").as("code"),
              array_min(col("_d")).as("dist2"))

  /** IVF-PQ-style approximate top-k by asymmetric distance computation (ADC):
    * every corpus vector is reduced to its `m` PQ codes; a query scores a
    * candidate as the sum over subspaces of the query-to-centroid distance of
    * the candidate's code — the corpus vectors themselves are never touched
    * at query time. The query-side table IS the classic ADC lookup table
    * (`m*k` integers per query), built with the same `pqPerSub` stage and
    * broadcast; the corpus side joins on the tiny (sub, code) key, so the
    * only exchange is the final per-(query, candidate) sum — at 100 TB the
    * scan reads `m` bytes of code per vector instead of `4*dim`.
    *
    * Integer milli-space distances end-to-end — ranking is engine-exact.
    */
  def ivfPqTopK(queries: DataFrame,
                corpus: DataFrame,
                idCol: String,
                vecCol: String,
                dim: Int = 64,
                m: Int = 4,
                k: Int = 16,
                topK: Int = 10): DataFrame = {
    val codes = pqAssign(corpus, idCol, vecCol, dim, m, k)
      .select(col("vec_id").as("neighbor_id"), col("sub"), col("code"))
    val lut = pqPerSub(queries, idCol, vecCol, dim, m, k)
      .select(col("vec_id").as("query_id"), col("sub"),
              posexplode_outer(col("_d")).as(Seq("_pos", "qdist")))
      .select(col("query_id"), col("sub"), col("_pos").cast("int").as("code"),
              col("qdist"))
    codes
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("qdist")).as("adc_dist2"))
      // top-k via the map-side-combining Aggregator, not a per-query
      // window: row_number over partitionBy(query) sorts the ENTIRE
      // n·|queries| scored relation through |queries| partitions, while
      // the Aggregator's partial buffers cap the final exchange at
      // topK·partitions rows per query (Stress11 decade-up finding).
      // Ordering is identical: (-adc) desc, neighbor asc == adc asc,
      // neighbor asc.
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(topK)(
             -col("adc_dist2"), col("neighbor_id")).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"), (col("_pos") + 1).cast("int").as("rank"),
              col("_t._2").as("neighbor_id"),
              (-col("_t._1")).as("adc_dist2"))
  }

  /** Shared ranking: top-k per query with deterministic (cosine desc, id asc)
    * tie-break; cosine rounded to 4 decimals for cross-engine compare.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank",
                  row_number().over(Window.partitionBy(col("query_id"))
                    .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cosine"), 4).as("cosine"))

  /** Symmetric int8 vector quantization: per-vector scale = max |x|, code =
    * floor(x * 127 / scale) — 4x memory cut for ANN shortlists (float32 ->
    * int8), the usual companion to PQ. floor, not round: half-even rounding
    * is engine-specific; floor is IEEE-exact everywhere. Zero vectors code
    * to all-zero. Pure narrow projection (array HOFs, no shuffle); output
    * exploded to (vec_id, i, code) rows.
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ma = array_max(transform(col(vecCol), x => abs(x))).cast("double")
    val codes = when(ma === 0.0, transform(col(vecCol), _ => lit(0)))
      .otherwise(transform(col(vecCol),
        x => floor(x.cast("double") * lit(127.0) / ma).cast("int")))
    df.select(col(idCol).as("vec_id"), posexplode(codes).as(Seq("i", "code")))
  }

  /** Upper-triangle Gram matrix Σᵥ q(v)ᵢ·q(v)ⱼ of the corpus's embedding
    * slab — the one-pass sufficient statistic behind PCA/whitening/ridge
    * (the d×d covariance follows from Gram + the mean vector). Elements
    * quantized `floor(x·scale)` to BIGINT so the accumulation is exact in
    * any engine (float sums are order-dependent; a 1000-executor
    * tree-aggregate would hash differently run to run).
    *
    * Shuffle shape: the per-row pair expansion is a NARROW generate
    * (d·(d+1)/2 rows per vector), and the groupBy on (i, j) is
    * combine-enabled — partial sums collapse to ≤ d² rows per partition
    * before the exchange, so the shuffle moves O(d²·partitions) rows
    * regardless of corpus size. 64-bit safe while n·(scale·max|x|)² <
    * 9e18 — ~1e10 unit-scale vectors at scale=1000; shrink `scale` or
    * lift to DECIMAL beyond.
    */
  /** Full Lloyd k-means, `rounds` exact integer iterations (the
    * multi-round upgrade of [[kmeansStep]]'s single assignment): vectors
    * quantized to the NON-NEGATIVE integer grid
    * `clamp(floor(x·1000), ±1000) + 1000` — non-negativity is load-bearing
    * for cross-engine exactness, because Spark's `DIV` truncates toward
    * zero while DuckDB's `//` floors, and they agree only on non-negative
    * operands (centroid updates divide sums by counts). Seeds = the k
    * lowest-id vectors. Assignment is a (vector-dim × k-centroid)
    * equi-join on dim with the centroid side broadcast (k·d rows), argmin
    * by (distance², cluster); update is one combine-enabled (cluster,
    * dim) aggregate. Per round: one broadcast join + two narrow
    * aggregates — corpus never shuffles except by (cluster, dim) at
    * k·d·partitions rows.
    *
    * Returns the final centroid table (cluster, dim, c) plus each
    * cluster's member count.
    */
  def kmeansLloyd(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, dims: Int, rounds: Int): DataFrame = {
    val ck = new Seal.Tracker
    val vecs = ck.track(df.select(col(idCol).as("vec_id"), posexplode(expr(
        s"""transform(slice($vecCol, 1, $dims),
           |  x -> CAST(greatest(least(floor(x * 1000), 1000.0D),
           |                     -1000.0D) AS BIGINT) + 1000L)"""
          .stripMargin)).as(Seq("dim", "q")))
      .localCheckpoint(false))
    // Seeds = the k ACTUAL lowest ids (rank, not `vec_id < k`): with
    // sparse or offset id domains the filter form silently seeds fewer
    // than k clusters. Cluster index = dense rank 0..k-1, which equals
    // vec_id on dense 0-based ids (bit-identical to the oracle there).
    // k rows — driver-sized; the single-partition window is fine.
    val seedIds = vecs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
      .withColumn("cluster",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
    var cent = ck.track(vecs.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("cluster"), col("dim"), col("q").as("c"))
      .localCheckpoint(false))
    var assign: DataFrame = null
    for (_ <- 1 to rounds) {
      assign = ck.track(vecs.join(broadcast(cent), Seq("dim"))
        .groupBy(col("vec_id"), col("cluster"))
        .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("_d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("_d2"), col("cluster"))).as("_m"))
        .select(col("vec_id"), col("_m.cluster").as("cluster"))
        .localCheckpoint(false))
      cent = ck.track(vecs.join(assign, Seq("vec_id"))
        .groupBy(col("cluster"), col("dim"))
        .agg(expr("sum(q) DIV count(1)").as("c"))
        .localCheckpoint(false))
    }
    val sizes = assign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    ck.seal(cent.join(sizes, Seq("cluster"))
      .select("cluster", "dim", "c", "n_members"))
  }

  def gramMatrix(df: DataFrame, vecCol: String, dims: Int,
                 scale: Int = 1000): DataFrame = {
    // Implementation is functions.GramAgg — a typed Aggregator whose
    // buffer IS the flat d·(d+1)/2 triangle, accumulated by a primitive
    // nested loop per row. No per-pair row ever exists: one buffer per
    // map task crosses the shuffle. (The first formulation exploded
    // d·(d+1)/2 struct rows per vector through generate+hash-agg and
    // paid 14.8 s / 250 k vectors; same math, array-arithmetic speed.)
    val tri = df.agg(
      graft.functions.GramAgg.gram(dims, scale)(col(vecCol)).as("_g"))
    // unpack the buffer to (i, j, g) rows: regenerate the (i, j) index
    // walk and zip with the values — metadata-sized
    tri.select(posexplode(expr(
        s"""flatten(transform(sequence(1, $dims), i ->
           |  transform(sequence(i, $dims), j ->
           |    struct(i AS i, j AS j))))""".stripMargin))
        .as(Seq("_idx", "_ij")), col("_g"))
      .select(col("_ij.i").as("i"), col("_ij.j").as("j"),
              expr("element_at(_g, _idx + 1)").as("g"))
  }

  /** Power iteration on an (upper-triangle) Gram relation: `iters` exact
    * integer matrix-vector products starting from e₁·10⁶, each rescaled
    * `DIV 10⁶` in pinned order — the dominant-eigenvector direction of
    * the embedding second-moment matrix (top principal axis, unscaled:
    * normalization is a positive scalar that cannot change the
    * direction's ratios beyond the shared DIV truncation, which the
    * oracle reproduces exactly). Components go NEGATIVE, and Spark's
    * `DIV` truncates toward zero while DuckDB's `//` floors — so a
    * cross-engine oracle must fold the sign: `-((-s) // b)` for s < 0.
    * Everything is d-sized: mirror the triangle, join, combine — the
    * corpus was already reduced by [[gramMatrix]].
    */
  def powerIteration(gram: DataFrame, iters: Int): DataFrame = {
    val full = gram.unionByName(
        gram.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("g")))
      .localCheckpoint(false)
    var v = full.select(col("i").as("j")).distinct()
      .withColumn("v", when(col("j") === 1, lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      v = full.join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(expr("sum(g * v) DIV 1000000L").as("v"))
        .withColumnRenamed("i", "j")
    }
    Seal(v.select(col("j").as("dim"), col("v")), ckpts = Seq(full))
  }

  /** Exact n²-scaled covariance matrix from the Gram triangle plus the
    * per-dimension sums: ncov(i,j) = n·G(i,j) − S(i)·S(j) — integer
    * algebra only, so the full covariance surface hashes bit-identically
    * (the float covariance would be order-dependent). One [[gramMatrix]]
    * pass + one d-row sums aggregate; the join is d²-sized.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dims: Int,
                       scale: Int = 1000): DataFrame = {
    val gram = gramMatrix(df, vecCol, dims, scale)
    val sums = df.select(posexplode(expr(
        s"""transform(slice($vecCol, 1, $dims),
           |  x -> CAST(floor(x * $scale) AS BIGINT))""".stripMargin))
        .as(Seq("_d0", "q")))
      .groupBy((col("_d0") + 1).as("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .localCheckpoint(false)
    Seal(gram
      .join(broadcast(sums.select(col("dim").as("i"), col("s").as("_si"),
                                  col("n").as("_n"))), Seq("i"))
      .join(broadcast(sums.select(col("dim").as("j"), col("s").as("_sj"))),
            Seq("j"))
      .select(col("i"), col("j"),
              (col("_n") * col("g") - col("_si") * col("_sj")).as("ncov")),
      ckpts = Seq(sums))
  }
}
