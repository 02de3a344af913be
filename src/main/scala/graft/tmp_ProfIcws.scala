package graft
object ProfIcws {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"STAGE $l%-14s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r }
    val docs = sources.ViewingData.table(spark, "/root/testdata/sf0.1", "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text")).localCheckpoint()
    val sigs0 = time("signatures") {
      operators.Icws.signatures(docs, "doc_id", "text", 16).localCheckpoint()
    }
    val sigs = sigs0.join(docs.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id").localCheckpoint()
    val cand = time("candidates") {
      operators.Icws.candidates(sigs, "doc_id", 8, 2, Seq("lang","n_chars")).localCheckpoint()
    }
    println("ncand=" + cand.count())
    time("verify") {
      QueriesML.weightedJaccardVerify(docs, cand, 0.55)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
