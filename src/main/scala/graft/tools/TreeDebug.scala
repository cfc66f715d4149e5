package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexSettings}
import graft.search._

object TreeDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("tree-debug").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-proxdebug"
    val stg = IndexSettings(searchableFields = Seq("text"))
    if (!new java.io.File(s"$dir/_graft_manifest.jsonl").exists())
      new IndexBuilder(spark, stg).build(
        graft.webgen.WebPages.generate(spark, 3000), dir, resume = false)
    val index = GraftIndex(spark, dir, stg)
    val q = args.headOption.getOrElse("the w3 w10 ").replace('_', ' ')
    val parts = QueryTree.primitiveQuery(q, stg.stopWords)
    println(s"[treedbg] parts=$parts")
    val tree = QueryTree.build(index.queryContext,
      QueryTree.MatchingStrategy.Last, authorizeTypos = true, parts).get
    val branches = QueryTree.wordsBranches(tree)
    branches.zipWithIndex.foreach { case (op, i) =>
      println(s"[treedbg] branch $i: $op")
    }
    spark.stop()
  }
}
