package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Dot products run through codegen'd higher-order
  * array functions (`zip_with` + `aggregate`), accumulating in double with
  * a defined left-to-right order, so results are deterministic under any
  * partitioning.
  */
object Similarity {

  /** left-fold dot product of two float-array columns, in double */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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
  def lshTopK(items: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, nPlanes: Int = 16,
              bands: Int = 4): DataFrame = {
    val planes: Seq[Seq[Double]] = {
      // deterministic pseudo-random hyperplanes (xorshift on indices)
      (0 until nPlanes).map { p =>
        (0 until dim).map { d =>
          val x = (p.toLong * 2654435761L + d * 40503L + 0x9E3779B9L)
          val m = (x ^ (x >>> 13)) * 0x5DEECE66DL
          ((m >>> 11) % 2048).toDouble / 1024.0 - 1.0
        }
      }
    }
    def signature(v: Column): Column = array(planes.map { pl =>
      val planeCol = array(pl.map(lit): _*)
      (aggregate(zip_with(v, planeCol, (x, r) => x.cast("double") * r),
        lit(0.0), (acc, x) => acc + x) >= 0).cast("int")
    }: _*)

    val rows = nPlanes / bands
    def banded(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"),
          signature(col(vecCol)).as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")

    val it = banded(items, "item")
    val q = banded(queries, "query")
    val cand = it.join(q, Seq("band", "key"))
      .filter(col("query_id") =!= col("item_id"))
      .select("query_id", "query_vec", "item_id", "item_vec").distinct()
    val scored = cand.withColumn("score",
      cosine(col("query_vec"), col("item_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "item_id", "score")
  }
}
