package graft.tools

import graft.functions.ExprKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Throwaway diagnostics main for interactive debugging.
  * Currently: MinHash estimator sanity — over many random set pairs with
  * known Jaccard J, mean signature agreement must approach J.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val k = 16
    def sig(items: Seq[String]): Seq[Long] = {
      val arr = new GenericArrayData(
        items.map(UTF8String.fromString).toArray.asInstanceOf[Array[Any]])
      ExprKernels.minhash(arr, k).toLongArray().toSeq
    }
    var totalAgree = 0.0
    val trials = 500
    (0 until trials).foreach { t =>
      val base = (0 until 10).map(i => s"tok${t}_$i")
      val a = base.take(8)
      val b = base.drop(2) // overlap 6, union 10 -> J = 0.6
      val (sa, sb) = (sig(a), sig(b))
      totalAgree += sa.zip(sb).count { case (x, y) => x == y } / k.toDouble
    }
    println(f"mean agreement ${totalAgree / trials}%.4f vs true J 0.6000")
  }
}
