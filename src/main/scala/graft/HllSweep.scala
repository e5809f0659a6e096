package graft
import graft.functions.Hll
object HllSweep {
  def main(args: Array[String]): Unit = {
    println("n,est,relerr_pct")
    for (n <- Seq(1000, 5000, 10000, 20000, 30000, 40000, 50000, 60000, 80000,
                  100000, 200000, 500000, 1000000, 5000000)) {
      val r = Hll.emptyRegisters()
      var i = 0
      while (i < n) { Hll.add(r, Hll.hash(s"sweep-$i")); i += 1 }
      val e = Hll.estimate(r)
      println(f"$n,$e,${100.0 * (e - n) / n}%.3f")
    }
  }
}
