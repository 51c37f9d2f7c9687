package graft.scratch

import org.apache.spark.sql.SparkSession

object MergeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    import s.implicits._
    val wh = "/tmp/probe/wh" + System.nanoTime()
    s.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse", wh)
    s.sql("CREATE NAMESPACE g.db")
    s.sql("CREATE TABLE g.db.t (k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO g.db.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    Seq((2L, 20.0), (4L, 40.0)).toDF("k", "v").createOrReplaceTempView("src")
    // probe 1: DELETE FROM
    try s.sql("DELETE FROM g.db.t WHERE k = 3")
    catch { case e: Throwable =>
      println("DELETE-ERR: " + e.getClass.getName + ": " + e.getMessage.take(400)) }
    println("AFTER-DELETE: " + s.sql("SELECT * FROM g.db.t ORDER BY k").collect().mkString(","))
    try s.sql("DELETE FROM g.db.t WHERE k % 2 = 0")
    catch { case e: Throwable =>
      println("DELETE-MOD-ERR: " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    try s.sql("DELETE FROM g.db.t WHERE k IN (99)")
    catch { case e: Throwable =>
      println("DELETE-IN-ERR: " + e.getClass.getName + ": " + e.getMessage.take(300)) }
    // probe 2: MERGE INTO
    try s.sql("MERGE INTO g.db.t USING src ON g.db.t.k = src.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    catch { case e: Throwable =>
      println("MERGE-ERR: " + e.getClass.getName + ": " + e.getMessage.take(600)) }
    println("FINAL: " + s.sql("SELECT * FROM g.db.t ORDER BY k").collect().mkString(","))
    s.stop()
  }
}
