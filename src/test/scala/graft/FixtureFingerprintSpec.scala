package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JVM side of the fixture-fingerprint gate (tools/fixture_fingerprint.py
  * is the strict arrow-level side, run by tools/local_verify.py).
  *
  * Round-8 post-mortem: a silent driver-side regeneration of
  * events.parquet flipped the ts column's parquet logical type and every
  * cached "green" claim went stale. The committed fingerprint
  * (tools/fixtures.fingerprint.json) pins row count + column inventory
  * for every fixture file; this spec re-checks the subset Spark can see
  * cheaply (row counts from parquet metadata, column names from the
  * footer schema) so `sbt test` also fails loudly on testdata drift, not
  * only the python gate.
  */
class FixtureFingerprintSpec extends GraftSuite {

  private val fpFile = new java.io.File("tools/fixtures.fingerprint.json")

  test("every committed fixture fingerprint matches on-disk testdata") {
    assume(fpFile.exists(), "fingerprint file missing")
    val json = JsonMethods.parse(
      scala.io.Source.fromFile(fpFile)(scala.io.Codec.UTF8).mkString)
    val entries = json.asInstanceOf[JObject].obj
    assert(entries.size >= 30, s"expected >=30 fixture entries, got ${entries.size}")
    val drifts = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((key, fp) <- entries) {
      val path = s"/root/testdata/$key.parquet"
      if (!new java.io.File(path).exists()) {
        drifts += s"$key: file disappeared"
      } else {
        val df = spark.read.parquet(path)
        val JInt(wantRows) = fp \ "rows": @unchecked
        val wantCols = (fp \ "columns").asInstanceOf[JArray].arr.map { c =>
          val JString(n) = c \ "name": @unchecked; n
        }
        val gotRows = df.count()
        if (gotRows != wantRows.toLong)
          drifts += s"$key: rows $gotRows != recorded $wantRows"
        if (df.columns.toSeq != wantCols)
          drifts += s"$key: columns ${df.columns.mkString(",")} != " +
            s"recorded ${wantCols.mkString(",")}"
      }
    }
    assert(drifts.isEmpty,
      "fixture drift (driver testdata changed since fingerprint was " +
        "recorded — investigate, then re-record with " +
        "`python3 tools/fixture_fingerprint.py --write`):\n" +
        drifts.mkString("\n"))
  }
}
