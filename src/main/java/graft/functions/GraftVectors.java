package graft.functions;

import org.apache.spark.sql.catalyst.util.ArrayData;

/**
 * Vector kernels behind the graft cosine expression. Element order and
 * operation order are IDENTICAL to the composed built-in formulation
 * {@code dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))} with dot =
 * left-fold of per-element double products (zip_with + aggregate), so
 * swapping the HOF chain for this kernel is bit-exact.
 */
public final class GraftVectors {
  private GraftVectors() {}

  /** Cosine similarity of two numeric arrays read as doubles. Arrays are
   *  float[] or double[] valued ArrayData; elements are widened like
   *  {@code cast(x as double)}. */
  public static double cosine(ArrayData a, ArrayData b, boolean aFloat, boolean bFloat) {
    int n = Math.min(a.numElements(), b.numElements());
    double dot = 0.0, na = 0.0, nb = 0.0;
    for (int i = 0; i < n; i++) {
      double x = aFloat ? (double) a.getFloat(i) : a.getDouble(i);
      double y = bFloat ? (double) b.getFloat(i) : b.getDouble(i);
      dot += x * y;
    }
    int an = a.numElements();
    for (int i = 0; i < an; i++) {
      double x = aFloat ? (double) a.getFloat(i) : a.getDouble(i);
      na += x * x;
    }
    int bn = b.numElements();
    for (int i = 0; i < bn; i++) {
      double y = bFloat ? (double) b.getFloat(i) : b.getDouble(i);
      nb += y * y;
    }
    return dot / (Math.sqrt(na) * Math.sqrt(nb));
  }

  /** Left-fold dot product with cast-to-double widening — identical to
   *  aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, v) -> acc+v)
   *  on equal-length arrays with non-null elements. */
  public static double dot(ArrayData a, ArrayData b, boolean aFloat, boolean bFloat) {
    int n = Math.min(a.numElements(), b.numElements());
    double dot = 0.0;
    for (int i = 0; i < n; i++) {
      double x = aFloat ? (double) a.getFloat(i) : a.getDouble(i);
      double y = bFloat ? (double) b.getFloat(i) : b.getDouble(i);
      dot += x * y;
    }
    return dot;
  }

  /** Symmetric int8 scalar quantization: q_i = floor(x_i·scale + 0.5)
   *  with scale = 127/max|x| (0 when the vector is all zeros). Every
   *  step is a deterministic double op — floor(+0.5) instead of a
   *  rounding mode so any engine (incl. the DuckDB oracle) reproduces
   *  the exact codes. |x_i·scale| ≤ 127 by construction, so the cast
   *  to byte never wraps. */
  public static byte[] quantizeI8(ArrayData v, boolean isFloat) {
    int n = v.numElements();
    double maxAbs = 0.0;
    for (int i = 0; i < n; i++) {
      double x = isFloat ? (double) v.getFloat(i) : v.getDouble(i);
      double ax = Math.abs(x);
      if (ax > maxAbs) maxAbs = ax;
    }
    double scale = maxAbs == 0.0 ? 0.0 : 127.0 / maxAbs;
    byte[] q = new byte[n];
    for (int i = 0; i < n; i++) {
      double x = isFloat ? (double) v.getFloat(i) : v.getDouble(i);
      q[i] = (byte) Math.floor(x * scale + 0.5);
    }
    return q;
  }

  /** The scale factor quantizeI8 used (needed to de-quantize scores). */
  public static double quantizeScale(ArrayData v, boolean isFloat) {
    int n = v.numElements();
    double maxAbs = 0.0;
    for (int i = 0; i < n; i++) {
      double x = isFloat ? (double) v.getFloat(i) : v.getDouble(i);
      double ax = Math.abs(x);
      if (ax > maxAbs) maxAbs = ax;
    }
    return maxAbs == 0.0 ? 0.0 : 127.0 / maxAbs;
  }

  /** Integer dot product of two int8 code arrays: exact (≤ 127²·n, no
   *  overflow for any realistic dimension), so equality across engines
   *  is bit-for-bit. */
  public static long dotI8(ArrayData a, ArrayData b) {
    int n = Math.min(a.numElements(), b.numElements());
    long dot = 0L;
    for (int i = 0; i < n; i++) {
      dot += (long) a.getByte(i) * (long) b.getByte(i);
    }
    return dot;
  }

  /** Product-quantization encode: for each of `m` subspaces of width
   *  d = q.length/m, the id of the squared-L2-nearest codeword in the
   *  flat codebook `cb` (laid out [ms][k][j], i.e. ms*k*d + kk*d + j),
   *  ties to the smallest id. Exact int64 arithmetic on the int8 grid —
   *  one static call per row keeps the m·k·d loop out of the generated
   *  source, so whole-stage codegen stays small and compiles.
   *
   *  The subspace width is the CODEBOOK's d = cb.length/(m*k), never
   *  derived from the row: a vector whose length is not exactly m*d
   *  returns null (the expression is nullable) instead of indexing the
   *  codebook out of bounds (longer rows) or silently reading a
   *  misaligned layout (shorter/non-divisible rows). */
  public static int[] pqEncode(ArrayData q, long[] cb, int m, int k) {
    int d = cb.length / (m * k);
    if (q.numElements() != m * d) return null;
    int[] codes = new int[m];
    for (int ms = 0; ms < m; ms++) {
      long best = Long.MAX_VALUE;
      int bestK = 0;
      int base = ms * k * d;
      for (int kk = 0; kk < k; kk++) {
        long s = 0L;
        int cbase = base + kk * d;
        for (int j = 0; j < d; j++) {
          long e = (long) q.getByte(ms * d + j) - cb[cbase + j];
          s += e * e;
        }
        if (s < best) { best = s; bestK = kk; }
      }
      codes[ms] = bestK;
    }
    return codes;
  }
}
