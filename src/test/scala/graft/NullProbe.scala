package graft
object NullProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""select cosine_sim(array(0.0d,0.0d), array(1.0d,1.0d)) zc,
                        cosine_sim(array(0.0d,0.0d), array(1.0d,1.0d)) is null zn,
                        minhash_sig(array_remove(array(1L),1L), 8) ms,
                        simhash64(array_remove(array(1L),1L)) sh,
                        coalesce(cosine_sim(array(0.0d,0.0d), array(1.0d,1.0d)), -99.0) cz
                 """).show(false)
    spark.stop()
  }
}
