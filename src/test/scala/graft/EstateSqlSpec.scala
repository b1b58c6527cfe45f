package graft

import graft.operators.StableRead
import graft.sql.EstateSql
import org.apache.spark.sql.functions._

/** The SQL estate surface (round 19): `VERSION AS OF` /
  * `TIMESTAMP AS OF` / plain live reads over registered estate roots,
  * resolved by the injected analyzer rule. The q206 gate pins the full
  * BM25 probe through this surface against the DuckDB oracle; this spec
  * drills the rule's edges — resolution semantics, qualification, error
  * classes, and non-interference with unregistered names.
  */
class EstateSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshEstate(tag: String): String = {
    val root = s"${java.nio.file.Files.createTempDirectory(tag)}/est"
    StableRead.withMaintenanceMarker(spark, root) {
      graft.sinks.Sinks.landTable(
        spark.range(10).toDF("id"), root, "t")
    }
    StableRead.withMaintenanceMarker(spark, root) {
      graft.sinks.Sinks.landTable(
        spark.range(25).toDF("id"), root, "t")
    }
    root
  }

  test("VERSION AS OF / TIMESTAMP AS OF / live reads resolve the library's exact relations") {
    val root = freshEstate("estsql")
    EstateSql.registerEstate("sqlspec", root)
    assert(spark.sql("SELECT count(*) AS n FROM sqlspec.t")
      .collect()(0).getLong(0) === 25L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlspec.t VERSION AS OF 1")
      .collect()(0).getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) AS n FROM sqlspec.t VERSION AS OF 2")
      .collect()(0).getLong(0) === 25L)
    // timestamp addressing: generation 1's own commit instant
    val ts1 = StableRead.snapshotCommitTime(spark, root, 1L).get
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ts1))
    assert(spark.sql(
        s"SELECT count(*) AS n FROM sqlspec.t TIMESTAMP AS OF '$lit'")
      .collect()(0).getLong(0) === 10L)
    // qualified column references and a self-join across generations
    val grew = spark.sql(
      """SELECT count(*) AS n
         FROM sqlspec.t cur
         LEFT ANTI JOIN (SELECT id FROM sqlspec.t VERSION AS OF 1) old
         ON cur.id = old.id""").collect()(0).getLong(0)
    assert(grew === 15L, "cross-generation anti-join must see the delta")
  }

  test("error classes: expired generation, bad version, pre-history timestamp") {
    val root = freshEstate("estsql-err")
    EstateSql.registerEstate("sqlspecerr", root)
    StableRead.gc(spark, root, keepGenerations = 1)
    val expired = intercept[Exception] {
      spark.sql("SELECT * FROM sqlspecerr.t VERSION AS OF 1").collect()
    }
    assert(expired.getMessage.contains("no readable generation"),
      s"wrong class: ${expired.getMessage}")
    val badVer = intercept[Exception] {
      spark.sql("SELECT * FROM sqlspecerr.t VERSION AS OF 'abc'").collect()
    }
    assert(badVer.getMessage.contains("generation number"),
      s"wrong class: ${badVer.getMessage}")
    val preHistory = intercept[Exception] {
      spark.sql("SELECT * FROM sqlspecerr.t " +
        "TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
    assert(preHistory.getMessage.contains("no retained generation"),
      s"wrong class: ${preHistory.getMessage}")
  }

  test("unregistered names pass through to Spark's own resolution untouched") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_no_such_estate.t").collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.contains("cannot be found"),
      s"wrong class: ${e.getMessage}")
    // and a registered-then-unregistered name reverts to not-found
    val root = freshEstate("estsql-unreg")
    EstateSql.registerEstate("sqlspectmp", root)
    assert(spark.sql("SELECT count(*) FROM sqlspectmp.t")
      .collect()(0).getLong(0) === 25L)
    EstateSql.unregisterEstate("sqlspectmp")
    intercept[Exception] {
      spark.sql("SELECT * FROM sqlspectmp.t").collect()
    }
  }
}
