package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Dot products run through the native codegen'd
  * [[graft.functions.VecDot]]/[[graft.functions.VecCosine]] kernels (the
  * interpreted `aggregate(zip_with(...))` fold was the dominant scoring
  * cost), accumulating in double with the same left-to-right order, so
  * results are deterministic under any partitioning and bit-identical to
  * the HOF formulation.
  */
object Similarity {

  /** left-to-right dot product of two numeric-array columns, in double */
  def dot(a: Column, b: Column): Column = graft.functions.F.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.F.vecCosine(a, b)

  /** Brute-force cosine top-k: every query against every item (the exact
    * baseline). Broadcast the query set — the item side streams, no
    * shuffle of the corpus. */
  def bruteForceTopK(items: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"))
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("ivec"))
    val scored = it.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("score", cosine(col("qvec"), col("ivec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "item_id", "score")
  }

  /** LSH-bucketed ANN via random hyperplane signatures (the scale path):
    * sign(v . r_i) over `nPlanes` deterministic pseudo-random hyperplanes
    * gives a bit signature; candidates share a signature band. Recall is
    * tunable with bands/planes; the corpus never cross-joins. */
  /** IVF (inverted-file) ANN — the second scale path beside LSH: a coarse
    * quantizer assigns every item to its nearest centroid cell (one
    * broadcast join against the tiny centroid set + per-item argmax, a
    * single map-side pass over the corpus); a query probes only its
    * `nProbe` closest cells, so the scored candidate set is
    * |corpus| * nProbe / nCells instead of |corpus|.
    *
    * The quantizer is pluggable: pass trained centroids (e.g. k-means) via
    * `centroids`; the default takes the `nCells` lowest-id items — a
    * deterministic choice that keeps the whole operator reproducible in a
    * plain-SQL oracle (cell quality is the quantizer's job, the inverted
    * index mechanics are this operator's).
    */
  def ivfTopK(items: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              centroids: Option[DataFrame] = None): DataFrame = {
    val cent = centroids.getOrElse(
        items.orderBy(col(idCol)).limit(nCells))
      .select(col(idCol).as("cell_id"), col(vecCol).as("cvec"))
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("ivec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))

    // assignment: argmax cosine over the broadcast centroid set — a
    // max_by groupBy, NOT a row_number window: partial aggregation
    // collapses the nCells candidate rows per item map-side (they sit in
    // the item's own input partition after the broadcast cross), so the
    // one shuffle moves ONE row per corpus item instead of nCells.
    // Tie rule (equal cosine -> lowest cell id) is encoded as min_by of
    // (-csim, cell_id) — negating the always-numeric SIMILARITY, not the
    // id, so string ids (legal with pluggable centroids) survive ANSI
    // analysis; matches the oracle's ROW_NUMBER order.
    val cells = it.crossJoin(broadcast(cent))
      .withColumn("csim", cosine(col("ivec"), col("cvec")))
      .groupBy("item_id")
      .agg(min_by(struct(col("cell_id"), col("ivec")),
        struct((-col("csim")).as("nsim"), col("cell_id"))).as("best"))
      .select(col("best.cell_id").as("cell_id"), col("item_id"),
        col("best.ivec").as("ivec"))

    // probe list: nProbe closest cells per query
    val wQuery = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cell_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(wQuery))
      .filter(col("rn") <= nProbe)
      .select("query_id", "qvec", "cell_id")

    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id").asc)
    probes.join(cells, "cell_id")
      .filter(col("query_id") =!= col("item_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("qvec"), col("ivec")).as("score"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "item_id", "score")
  }

  /** Train IVF centroids with sampled k-means (Spark ML `KMeans`, i.e.
    * kmeans|| init) — the quality path for [[ivfTopK]]'s pluggable
    * quantizer. At 100 TB: fit on a sample (`sampleFraction`), never the
    * corpus; the model is tiny (nCells × dim) and the result broadcasts
    * into the same assignment join as the default quantizer. Returns
    * `(idCol: cell id, vecCol: float centroid)` shaped for `centroids=`.
    */
  def trainCentroids(items: DataFrame, idCol: String, vecCol: String,
                     nCells: Int, maxIter: Int = 10,
                     sampleFraction: Double = 1.0,
                     seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled =
      if (sampleFraction < 1.0) items.sample(sampleFraction, seed)
      else items
    val data = sampled.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setMaxIter(maxIter)
      .setSeed(seed).setFeaturesCol("features").fit(data)
    val spark = items.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i.toLong, v.toArray.map(_.toFloat)) }
      .toDF(idCol, vecCol)
  }

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss):
    * project each embedding onto `outDim` deterministic pseudo-random
    * hyperplanes — the cheap front-end for clustering / ANN when the
    * source dimension is large (project once, then every downstream
    * distance costs outDim instead of dim multiplies). Map-only, no
    * shuffle; each component is one native [[graft.functions.VecDot]]
    * pass. The planes come from [[hyperplanes]], whose components are
    * exact binary fractions, so the projection is reproducible anywhere
    * (including a plain-SQL oracle embedding the plane literals).
    * Returns `(id, proj: array<double>)`.
    */
  def randomProject(items: DataFrame, idCol: String, vecCol: String,
                    dim: Int, outDim: Int): DataFrame = {
    val planes = hyperplanes(outDim, dim)
    val comps = planes.map { p =>
      dot(col(vecCol), array(p.map(lit): _*))
    }
    items.select(col(idCol).as("id"), array(comps: _*).as("proj"))
  }

  /** Deterministic pseudo-random hyperplanes (xorshift on indices); every
    * component is an exact binary fraction k/1024 - 1, so SQL oracles can
    * embed the planes as literal arrays with no FP representation loss. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val x = (p.toLong * 2654435761L + d * 40503L + 0x9E3779B9L)
        val m = (x ^ (x >>> 13)) * 0x5DEECE66DL
        ((m >>> 11) % 2048).toDouble / 1024.0 - 1.0
      }
    }

  // --- product quantization (Jégou, Douze & Schmid, TPAMI 2011) ---

  // subspace j of a vector, widened to double BEFORE slicing so both
  // the codes and the ADC tables work on exactly the floats' values
  private def pqSlice(vec: Column, j: Int, sub: Int): Column =
    slice(vec.cast("array<double>"), j * sub + 1, sub)

  // squared L2 as dot(a,a) - 2*dot(a,b) + dot(b,b): three fixed-order
  // VecDot folds, the same expression an SQL oracle spells with
  // list_inner_product — no zip_with/aggregate HOF in the hot path
  private def pqD2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  // one codebook-resolution rule for the encoder AND the ADC tables
  // (they must agree, and the default's TakeOrdered should run once
  // per call chain). The code id is the row's idCol cast to int — a
  // non-numeric id would cast to NULL and silently corrupt every
  // assignment, so refuse it up front.
  private def resolveCodebook(items: DataFrame, idCol: String,
                              vecCol: String, nCodes: Int,
                              codebook: Option[DataFrame]): DataFrame = {
    val idType = codebook.getOrElse(items).schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"PQ codebook id column '$idCol' must be numeric to serve as " +
        s"the code id, got $idType")
    codebook.getOrElse(items.orderBy(col(idCol)).limit(nCodes))
      .select(col(idCol).cast("int").as("code_id"), col(vecCol).as("cvec"))
  }

  /** Product-quantization encoding: split each vector into `m` subspaces
    * of `dim/m` components and replace every subspace with the id of its
    * nearest codebook entry (squared L2; ties → lowest code id). The
    * corpus compresses from `dim` floats to `m` small ints per vector —
    * the memory-bound ANN path: at 100 TB of embeddings the codes table
    * is ~dim·32/(m·log₂ nCodes) times smaller than the vectors, and
    * [[pqTopK]] scores against codes only.
    *
    * The codebook is pluggable (pass per-subspace-aware centroids via
    * `codebook`); the default takes the `nCodes` lowest-id items' own
    * sub-vectors — deterministic, so the whole encoder reproduces in a
    * plain-SQL oracle (codebook quality is the trainer's job, the
    * encoding mechanics are this operator's, same split as [[ivfTopK]]).
    *
    * Scale shape: one broadcast cross against the nCodes-row codebook,
    * all `m` argmins computed in ONE aggregate (min_by partials collapse
    * the nCodes candidate rows map-side), so the single shuffle moves
    * one row of m ints per corpus item.
    *
    * Output: (item_id, code_0..code_{m-1}: int). */
  def pqEncode(items: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int = 4, nCodes: Int = 8,
               codebook: Option[DataFrame] = None): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val sub = dim / m
    val cb = resolveCodebook(items, idCol, vecCol, nCodes, codebook)
    val it = items.select(col(idCol).as("item_id"), col(vecCol).as("ivec"))
    val d2Cols = (0 until m).map(j =>
      pqD2(pqSlice(col("ivec"), j, sub), pqSlice(col("cvec"), j, sub))
        .as(s"d2_$j"))
    val crossed = it.crossJoin(broadcast(cb))
      .select((col("item_id") +: col("code_id") +: d2Cols): _*)
    val aggs = (0 until m).map(j =>
      min_by(col("code_id"), struct(col(s"d2_$j"), col("code_id")))
        .as(s"code_$j"))
    crossed.groupBy("item_id").agg(aggs.head, aggs.tail: _*)
  }

  /** PQ asymmetric-distance top-k (ADC): approximate each query→item
    * squared L2 as the sum of per-subspace distances from the query's
    * exact sub-vector to the item's CODE centroid — the corpus side is
    * only its [[pqEncode]] codes.
    *
    *   adc(q, x) = Σ_j d²(q_j, codebook[code_j(x)])
    *
    * Scale shape: the per-query distance tables are |queries|·nCodes
    * rows (driver-scalar-sized) and join the codes stream as `m`
    * broadcast hash joins whose summands add in fixed subspace order —
    * map-only over the corpus codes, bit-reproducible, no shuffle until
    * the per-query row_number top-k. A melted (item, j, code) regroup
    * would multiply the corpus stream m× before its join — the same
    * shape the LM melt experiment falsified (ARCHITECTURE.md).
    *
    * Output: (query_id, rank, item_id, adc6). */
  def pqTopK(items: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int, m: Int = 4,
             nCodes: Int = 8, codebook: Option[DataFrame] = None)
      : DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val sub = dim / m
    // resolve ONCE: the encoder and the ADC tables must use the same
    // codebook, and the default-codebook TakeOrdered should run once
    val cb = resolveCodebook(items, idCol, vecCol, nCodes, codebook)
    val codes = pqEncode(items, idCol, vecCol, dim, m, nCodes, Some(cb
      .select(col("code_id").as(idCol), col("cvec").as(vecCol))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val qd2Cols = (0 until m).map(j =>
      pqD2(pqSlice(col("qvec"), j, sub), pqSlice(col("cvec"), j, sub))
        .as(s"qd2_$j"))
    val dt = q.crossJoin(broadcast(cb))
      .select((col("query_id") +: col("code_id") +: qd2Cols): _*)
    val joined = (0 until m).foldLeft(codes) { (acc, j) =>
      val dtj = dt.select(col("query_id"), col("code_id").as(s"code_$j"),
        col(s"qd2_$j"))
      if (j == 0) acc.join(broadcast(dtj), Seq(s"code_$j"))
      else acc.join(broadcast(dtj), Seq("query_id", s"code_$j"))
    }
    val adc = (0 until m).map(j => col(s"qd2_$j")).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("item_id").asc)
    joined.filter(col("query_id") =!= col("item_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"),
        round(col("adc"), 6).as("adc6"))
  }

  /** Train a PQ codebook with per-subspace k-means (each subspace
    * clustered INDEPENDENTLY — the defining trick of product
    * quantization: m codebooks of nCodes centroids quantize nCodes^m
    * effective cells) — the quality path for [[pqEncode]]/[[pqTopK]]'s
    * pluggable codebook, exactly as [[trainCentroids]] is for
    * [[ivfTopK]]. Returns the codebook in the shape those operators
    * consume: row r is the concatenation over subspaces of each
    * subspace's r-th centroid (assignment slices per subspace, so the
    * rows' cross-subspace pairing carries no meaning).
    *
    * At 100 TB: fit on a sample; the codebook is m·nCodes·(dim/m)
    * floats — driver-trivial — and broadcasts into the same encode
    * join as the deterministic default. */
  def trainPqCodebook(items: DataFrame, idCol: String, vecCol: String,
                      dim: Int, m: Int = 4, nCodes: Int = 8,
                      maxIter: Int = 10, sampleFraction: Double = 1.0,
                      seed: Long = 42L): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sub = dim / m
    val sampled =
      if (sampleFraction < 1.0) items.sample(sampleFraction, seed)
      else items
    val centers: Seq[Array[Array[Float]]] = (0 until m).map { j =>
      val data = sampled.select(array_to_vector(
        slice(col(vecCol).cast("array<double>"), j * sub + 1, sub))
        .as("features"))
      val model = new KMeans().setK(nCodes).setMaxIter(maxIter)
        .setSeed(seed + j).setFeaturesCol("features").fit(data)
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    }
    val kMin = centers.map(_.length).min
    require(kMin == nCodes,
      s"trainPqCodebook: k-means produced only $kMin centroids in " +
        s"some subspace (degenerate data for nCodes=$nCodes) — lower " +
        "nCodes or train on more varied vectors")
    val spark = items.sparkSession
    import spark.implicits._
    (0 until nCodes).map { r =>
      (r.toLong, (0 until m).flatMap(j => centers(j)(r)).toArray)
    }.toDF(idCol, vecCol)
  }

  def lshTopK(items: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, nPlanes: Int = 16,
              bands: Int = 4): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    // one native call computes all nPlanes dot products into a bit
    // signature; band keys are then pure long shifts/masks (no string
    // concat, no interpreted per-band lambdas)
    val rows = nPlanes / bands
    val mask = (1L << rows) - 1
    def banded(df: DataFrame, side: String): DataFrame = {
      val sig = graft.functions.F.hyperplaneSig(col(vecCol), planes)
      val bandKeys = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * rows).bitwiseAND(lit(mask))
            .as("key"))
      }
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"),
          sig.as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          explode(array(bandKeys: _*)).as("bk"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          col("bk.band").as("band"), col("bk.key").as("key"))
    }

    val it = banded(items, "item")
    val q = banded(queries, "query")
    // score per banded collision first (dots are a cheap native kernel),
    // THEN distinct on the compact (query, item, score) rows — the dedup
    // shuffle moves ~24 bytes/candidate instead of two embedding vectors
    val scored = it.join(q, Seq("band", "key"))
      .filter(col("query_id") =!= col("item_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_vec"), col("item_vec")).as("score"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "item_id", "score")
  }
}
