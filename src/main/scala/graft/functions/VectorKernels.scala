package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static array kernels shared by expression eval AND generated code
  * (the Hashing static-forward pattern: doGenCode emits one call, so
  * the interpreted and codegen paths cannot drift).
  */
object VectorKernels {

  /** Intersection count of two SORTED string arrays. Balanced sides
    * take the linear merge; badly skewed sides (≥16×) gallop —
    * iterate the small side, binary-search the large from a moving
    * lower bound: O(ns·log nl) instead of O(ns+nl). The r18 q77b
    * probe motivated this: a per-row merge against a corpus-growing
    * bench gram array made the zero-shuffle decontamination gate
    * O(|bench|) per row (10× corpus: 30k-element merges × 50k rows);
    * galloping restores O(|g3|·log|bench|). For multiset inputs both
    * paths count min-multiplicity matches (the gallop advances its
    * lower bound past each match), so semantics are identical.
    */
  def intersectCountSorted(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 || ny == 0) 0
    else if (nx.toLong * 16 < ny) gallop(x, nx, y, ny)
    else if (ny.toLong * 16 < nx) gallop(y, ny, x, nx)
    else {
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }
  }

  private def gallop(s: ArrayData, ns: Int, l: ArrayData, nl: Int): Int = {
    var c = 0; var lo = 0; var i = 0
    while (i < ns && lo < nl) {
      val v = s.getUTF8String(i)
      var a = lo; var b = nl
      while (a < b) {
        val m = (a + b) >>> 1
        if (l.getUTF8String(m).compareTo(v) < 0) a = m + 1 else b = m
      }
      if (a < nl && l.getUTF8String(a).compareTo(v) == 0) { c += 1; lo = a + 1 }
      else lo = a
      i += 1
    }
    c
  }
}
