package graft.tools

/** Host-contention probe: prints the Bench.calibBurn figures (M iters/s)
  * for 1 and 32 threads plus a PASS/CONTENDED verdict against the idle
  * envelope in BENCH/BASELINE.md. Use before/after any measurement run —
  * a contended window under-reads the engine by the same factor.
  *
  * Usage: runMain graft.tools.CalibProbe [threads] (default prints 1+32)
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty) {
      val t = args(0).toInt
      println(f"calib_${t}t=${graft.Bench.calibBurn(t, 1.5)}%.0f M iters/s")
    } else {
      val c1 = graft.Bench.calibBurn(1, 1.5)
      val c32 = graft.Bench.calibBurn(32, 1.5)
      val verdict = if (c32 >= 11000 && c1 >= 460) "PASS (idle envelope)"
        else if (c32 >= 9000) "MARGINAL"
        else "CONTENDED"
      println(f"calib_1t=$c1%.0f calib_32t=$c32%.0f M iters/s  -> $verdict")
    }
  }
}
