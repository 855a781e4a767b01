package graft

import graft.functions.FirFilter

/** Scratch: Remez convergence + spec check for the predefined designs. */
object ProfFir {
  def main(args: Array[String]): Unit = {
    for (m <- Seq(4, 8, 21, 144)) {
      val fNyqNew = 1.0 / (2.0 * m)
      def specReport(name: String, h: Array[Double]): Unit = {
        val passDb = Seq(0.0, 0.3, 0.6, 0.79, 1.0).map(_ * 0.8 * fNyqNew)
          .map(f => math.abs(20 * math.log10(FirFilter.responseAt(h, f)))).max
        val stopDb = Seq(1.0, 1.2, 1.5, 3.0, 8.0).map(_ * fNyqNew)
          .filter(_ <= 0.5)
          .map(f => 20 * math.log10(FirFilter.responseAt(h, f))).max
        println(f"m=$m $name: taps=${h.length} passRipple=$passDb%.4f dB stopMax=$stopDb%.2f dB dc=${h.sum}%.6f")
      }
      val t0 = System.nanoTime()
      val ship = FirFilter.designDecimationFilter(m)
      val t1 = System.nanoTime()
      specReport("shipped", ship)
      println(f"  design time ${(t1 - t0) / 1e9}%.1fs")
      specReport("kaiser", FirFilter.kaiserLowpass(m))
      // did remez itself converge?
      val fPass = 0.8 * fNyqNew; val fStop = fNyqNew
      val deltaP = (math.pow(10, 0.1 / 20) - 1) / (math.pow(10, 0.1 / 20) + 1)
      val deltaS = math.pow(10, -80.0 / 20)
      val order = FirFilter.kaiserOrder(
        -20.0 * math.log10(math.min(deltaP, deltaS)), fStop - fPass)
      val t2 = System.nanoTime()
      val rz = FirFilter.remezLowpass(order, fPass, fStop, 1 / deltaP, 1 / deltaS)
      println(f"  remez(order=$order) converged=${rz.isDefined} in ${(System.nanoTime() - t2) / 1e9}%.1fs")
    }
  }
}
