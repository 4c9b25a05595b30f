package graft.rec

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding clustering (semantic-dedup / IVF-quantizer building block):
  * seeded MLlib k-means over the embeddings table. The fitted centroids
  * are exactly what an IVF index needs as its coarse quantizer (q57 uses
  * a sign grid; a learned quantizer drops in without changing the plan).
  */
object Clustering {

  def clusterEmbeddings(s: SparkSession, d: String, k: Int = 10,
                        seed: Long = 42L): DataFrame = {
    val df = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(df)
    model.transform(df)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("prediction").cast("long").as("cluster"))
      .orderBy(col("vec_id"))
  }
}
