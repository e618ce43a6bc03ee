package graft.tools
object ScaleProbe {
  def work(iters: Long): Long = {
    var h = 0L; var i = 0L
    while (i < iters) { h ^= graft.core.SipHash.hashInt(0x5eed, 0xf00d, (i & 0xffffff).toInt); i += 1 }
    h
  }
  def run(threads: Int, perThread: Long): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ => val t = new Thread(() => { work(perThread); () }); t.start(); t }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    work(2000000) // JIT warm
    for (n <- Seq(4, 8, 16, 32)) {
      val per = 40000000L
      val sec = Seq.fill(3)(run(n, per)).min
      println(f"threads=$n total=${n*per} sec=$sec%.3f hashes_per_sec=${n*per/sec}%.0f per_thread=${per/sec}%.0f")
    }
  }
}
