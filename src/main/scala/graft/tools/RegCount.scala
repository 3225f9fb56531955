package graft.tools
object RegCount {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Registry.all
    println(s"REGISTRY_SIZE=${all.size}")
    println(s"ORACLES=${all.count(_.oracle.nonEmpty)}")
  }
}
