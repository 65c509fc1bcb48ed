package graft.tools
object QCount {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QCOUNT=${q.size} ORACLES=${o.size} NO_ORACLE=${(q -- o).toSeq.sorted.mkString(",")}")
  }
}
