package graft.tools

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Throwaway diagnostics main for interactive debugging. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // Estimator sanity: over many random set pairs with known Jaccard J,
    // mean minhash agreement should approach J.
    val rnd = new scala.util.Random(7)
    val k = 16
    def sig(items: Seq[String]): Array[Long] = {
      val mins = Array.fill(k)(Long.MaxValue)
      items.foreach { it =>
        val s = UTF8String.fromString(it)
        var h = 0
        while (h < k) {
          val v = XxHash64Function.hash(s, StringType,
            h.toLong * graft.functions.MinHashSignature.SeedMix)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      mins
    }
    var totalAgree = 0.0
    var totalJ = 0.0
    val trials = 500
    (0 until trials).foreach { t =>
      val base = (0 until 10).map(i => s"tok${t}_$i")
      val a = base.take(8)
      val b = base.drop(2) // overlap 6, union 10 -> J = 0.6
      val (sa, sb) = (sig(a), sig(b))
      totalAgree += sa.zip(sb).count { case (x, y) => x == y } / k.toDouble
      totalJ += 0.6
    }
    println(f"mean agreement ${totalAgree / trials}%.4f vs true J ${totalJ / trials}%.4f")
  }
}
