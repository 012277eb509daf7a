package graft.tools

/** Throwaway sandbox probe: verifies Spark parallel speedup on pure CPU work. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.BenchCore.session(args(0))
    import spark.implicits._
    def job(iters: Int): Long =
      spark.range(0, 64, 1, 64).as[Long].map { p =>
        var acc = p; var i = 0
        while (i < iters) { acc = acc * 6364136223846793005L + 1442695040888963407L; i += 1 }
        acc
      }.reduce(_ ^ _)
    job(1000) // warm-up: codegen, JIT, executor threads
    val t0 = System.nanoTime
    job(400000000) // 25.6e9 LCG steps total
    println(f"CPUPROBE cpus=${args(0)} time=${(System.nanoTime - t0) / 1e9}%.2f")
    spark.stop()
  }
}
