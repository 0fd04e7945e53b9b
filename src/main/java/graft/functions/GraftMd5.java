package graft.functions;

/**
 * Minimal allocation-free MD5 (implemented from the public RFC 1321
 * specification) specialized to the engine's 60-bit string hash:
 * {@code hash60(bytes) = first 15 hex chars of md5 read base-16}, i.e.
 * the top 60 bits of the digest — identical to
 * {@code conv(substring(md5(s),1,15),16,10)} and to
 * {@link GraftStrings#hash60(String)}.
 *
 * Why not {@code java.security.MessageDigest}: the dedup kernels hash
 * hundreds of thousands of ~25-byte grams per scan task; MessageDigest
 * pays a per-call digest-array allocation, provider indirection, and an
 * internal buffer copy, which profiling showed dominating the (often
 * single-row-group, hence serialized) scan stage at small scale
 * factors. This implementation runs the compression function directly
 * on a caller-provided byte range with a thread-local 128-byte pad
 * scratch — no per-call allocation at all for any input length.
 *
 * The sine-derived round constants are computed at class init exactly
 * as RFC 1321 defines them (T[i] = integer part of 2^32 * |sin(i)|),
 * not transcribed — fewer digits to get wrong.
 */
public final class GraftMd5 {
  private GraftMd5() {}

  private static final int[] K = new int[64];
  static {
    for (int i = 0; i < 64; i++) {
      K[i] = (int) (long) (Math.abs(Math.sin(i + 1.0)) * 4294967296.0);
    }
  }

  private static final int[] S = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21
  };

  /** Scratch for the padded tail: at most two 64-byte blocks. */
  private static final ThreadLocal<byte[]> PAD =
      ThreadLocal.withInitial(() -> new byte[128]);

  /** state word accumulator used across {@link #block}; kept in a
   *  thread-local so the compression rounds can return four words
   *  without boxing or allocation. */
  private static final ThreadLocal<int[]> STATE =
      ThreadLocal.withInitial(() -> new int[4]);

  /** One MD5 compression round over the 64 bytes at {@code buf[off..]};
   *  updates {@code st} (a,b,c,d) in place. */
  private static void block(int[] st, byte[] buf, int off) {
    int a = st[0], b = st[1], c = st[2], d = st[3];
    for (int i = 0; i < 64; i++) {
      int f, g;
      if (i < 16) {
        f = (b & c) | (~b & d);
        g = i;
      } else if (i < 32) {
        f = (d & b) | (~d & c);
        g = (5 * i + 1) & 15;
      } else if (i < 48) {
        f = b ^ c ^ d;
        g = (3 * i + 5) & 15;
      } else {
        f = c ^ (b | ~d);
        g = (7 * i) & 15;
      }
      int o = off + (g << 2);
      int m = (buf[o] & 0xff) | ((buf[o + 1] & 0xff) << 8)
          | ((buf[o + 2] & 0xff) << 16) | ((buf[o + 3] & 0xff) << 24);
      int tmp = d;
      d = c;
      c = b;
      int x = a + f + K[i] + m;
      b = b + Integer.rotateLeft(x, S[i]);
      a = tmp;
    }
    st[0] += a;
    st[1] += b;
    st[2] += c;
    st[3] += d;
  }

  /** Top 60 bits of md5 over {@code buf[off..off+len)} — the engine's
   *  portable string-hash value (see class doc).
   */
  public static long hash60(byte[] buf, int off, int len) {
    int[] st = STATE.get();
    st[0] = 0x67452301;
    st[1] = 0xefcdab89;
    st[2] = 0x98badcfe;
    st[3] = 0x10325476;
    int full = len & ~63;
    for (int i = 0; i < full; i += 64) {
      block(st, buf, off + i);
    }
    int rem = len - full;
    byte[] pad = PAD.get();
    System.arraycopy(buf, off + full, pad, 0, rem);
    pad[rem] = (byte) 0x80;
    int nBlocks = (rem + 9 <= 64) ? 1 : 2;
    for (int i = rem + 1; i < nBlocks * 64 - 8; i++) {
      pad[i] = 0;
    }
    long bitLen = (long) len << 3;
    int lp = nBlocks * 64 - 8;
    for (int j = 0; j < 8; j++) {
      pad[lp + j] = (byte) (bitLen >>> (8 * j));
    }
    block(st, pad, 0);
    if (nBlocks == 2) {
      block(st, pad, 64);
    }
    // digest bytes 0..7 are a (little-endian) then b (little-endian);
    // combine exactly as GraftStrings.hash60 does: 7 bytes big-endian
    // then the high nibble of byte 7
    int a = st[0], b = st[1];
    long v = ((long) (a & 0xff) << 48)
        | ((long) ((a >>> 8) & 0xff) << 40)
        | ((long) ((a >>> 16) & 0xff) << 32)
        | ((long) ((a >>> 24) & 0xff) << 24)
        | ((long) (b & 0xff) << 16)
        | ((long) ((b >>> 8) & 0xff) << 8)
        | ((long) ((b >>> 16) & 0xff));
    return (v << 4) | ((b >>> 28) & 0xfL);
  }
}
