package graft.ext

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MLlib-native ANN path (SURVEY §2.11 X1/X2 design note): Euclidean
  * `BucketedRandomProjectionLSH` over L2-NORMALIZED vectors, where
  * euclidean distance is monotone in cosine similarity
  * (‖a−b‖² = 2 − 2·cos on unit vectors) — so approx-nearest-neighbour
  * and approx-similarity-join answer cosine questions. Seeded →
  * deterministic. This is the off-the-shelf alternative to the
  * hand-rolled hyperplane LSH in [[Similarity]]; both ship because the
  * MLlib API is the one a cluster team reaches for first.
  */
object MllibAnn {

  private def toFeatures(emb: DataFrame, embCol: String, idCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast(LongType).as("id"),
      col(embCol).cast(ArrayType(DoubleType)).as("e"))
      .withColumn("_n", Similarity.norm(col("e")))
      .withColumn("unit", zip_with(col("e"),
        array_repeat(greatest(col("_n"), lit(1e-12)), size(col("e"))),
        (x, n) => x / n))
      .as[(Long, Seq[Double], Double, Seq[Double])]
      .map { case (id, _, _, unit) => (id, MlVectors.dense(unit.toArray)) }
      .toDF("id", "features")
  }

  def fit(emb: DataFrame, embCol: String, idCol: String,
      numHashTables: Int = 4, bucketLength: Double = 0.5, seed: Long = 42L) = {
    val feats = toFeatures(emb, embCol, idCol).cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setNumHashTables(numHashTables)
      .setBucketLength(bucketLength)
      .setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    (lsh.fit(feats), feats)
  }

  /** Approx top-k by cosine (via unit-vector euclidean kNN). */
  def approxTopK(emb: DataFrame, embCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val (model, feats) = fit(emb, embCol, idCol)
    val qVec = feats.filter(col("id") === queryId)
      .collect()(0).getAs[org.apache.spark.ml.linalg.Vector]("features")
    model.approxNearestNeighbors(
        feats.filter(col("id") =!= queryId), qVec, k)
      .select(col("id"),
        (lit(1.0) - col("distCol") * col("distCol") / 2.0).as("cosine"))
      .orderBy(desc("cosine"), asc("id"))
  }

  /** Approx near-dup pairs above a cosine threshold. */
  def approxNearDupPairs(emb: DataFrame, embCol: String, idCol: String,
      cosineThreshold: Double): DataFrame = {
    val (model, feats) = fit(emb, embCol, idCol)
    val distThreshold = math.sqrt(2.0 - 2.0 * cosineThreshold)
    model.approxSimilarityJoin(feats, feats, distThreshold, "dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cosine"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }
}
