package graft.tools

/** Manual replay of the r14-ADVICE crash scale for Bench's synthetic
  * sorted-cohort writer: `ensureSortedVcfGz(n≈18M)` — the size the sf1
  * bench replay feeds it — used to die in the driver (`n * 120` Int
  * capacity went negative, and the single StringBuilder body would
  * have exceeded the max array length anyway). The streaming
  * BlockWriter path must write it in O(blockSize) memory.
  *
  * Run: `sbt "Test/runMain graft.tools.SortedVcfGzScaleCheck [n]"`
  * (not part of the suite — it writes ~300 MB to java.io.tmpdir and
  * takes a couple of minutes).
  */
object SortedVcfGzScaleCheck {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(18000000)
    val m = graft.Bench.getClass.getDeclaredMethods
      .find(_.getName.contains("ensureSortedVcfGz"))
      .getOrElse(sys.error("ensureSortedVcfGz not found"))
    m.setAccessible(true)
    val t0 = System.nanoTime
    val p = m.invoke(graft.Bench, Integer.valueOf(n))
      .asInstanceOf[String]
    val sz = java.nio.file.Files.size(java.nio.file.Paths.get(p))
    println(s"WROTE $p $sz bytes (n=$n) in " +
      f"${(System.nanoTime - t0) / 1e9}%.1f s")
    require(sz > 0L)
    java.nio.file.Files.delete(java.nio.file.Paths.get(p))
  }
}
