package graft.scratch

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule

class ProbeExt extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => ProbeRule)
  }
}

object ProbeRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      println(s"SEEN-MERGE resolved=${m.resolved} " +
        s"condResolved=${m.mergeCondition.resolved} " +
        s"matched=${m.matchedActions.map(_.getClass.getSimpleName)} " +
        s"notMatched=${m.notMatchedActions.map(_.getClass.getSimpleName)} " +
        s"target=${m.targetTable.getClass.getSimpleName}")
      println("TARGET-TREE:\n" + m.targetTable.treeString)
      plan
    case _ => plan
  }
}

object MergeProbe2 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[4]").appName("probe2")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "graft.GraftExtensions,graft.scratch.ProbeExt")
      .getOrCreate()
    import s.implicits._
    val wh = "/tmp/probe/wh" + System.nanoTime()
    s.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse", wh)
    s.sql("CREATE NAMESPACE g.db")
    s.sql("CREATE TABLE g.db.t (k BIGINT, v DOUBLE)")
    s.sql("INSERT INTO g.db.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    Seq((2L, 20.0), (4L, 40.0)).toDF("k", "v").createOrReplaceTempView("src")
    println("STRATEGIES: " + s.sessionState.planner.strategies
      .map(_.getClass.getSimpleName).mkString(","))
    try s.sql("MERGE INTO g.db.t USING src ON g.db.t.k = src.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    catch { case e: Throwable =>
      println("MERGE-ERR: " + e.getClass.getName + ": " + e.getMessage.take(200))
      println("MERGE-STACK: " + e.getStackTrace.take(10).mkString(" | ")) }
    s.stop()
  }
}
