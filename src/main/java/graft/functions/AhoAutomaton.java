package graft.functions;

import java.io.Serializable;
import java.nio.charset.StandardCharsets;
import java.util.ArrayDeque;

/** Aho-Corasick automaton (Aho &amp; Corasick, CACM 1975) over raw
 *  UTF-8 bytes: the single-pass multi-pattern matcher behind the
 *  blocklist/PII scan — one corpus read finds every occurrence of
 *  every pattern (overlapping and nested included) in
 *  O(text + matches), where the naive alternative is |patterns|
 *  regex/contains passes over the corpus.
 *
 *  Layout: dense goto table (states × 256 — states are bounded by
 *  total pattern bytes + 1, so a production blocklist of ~10k short
 *  phrases is a few MB, broadcast-friendly), BFS fail links, and
 *  DICTIONARY SUFFIX LINKS ({@code out}) so match enumeration per
 *  position walks only states that actually end a pattern — the
 *  standard trick that keeps the inner loop proportional to real
 *  matches, not fail-chain length. Instances ride the Spark plan as
 *  reference objects (built once per plan, serialized to executors),
 *  hence {@link Serializable} with plain int arrays.
 */
public final class AhoAutomaton implements Serializable {
  private static final long serialVersionUID = 1L;

  final int[][] go;      // goto function: state × byte -> state
  final int[] fail;      // fail links
  final int[] patAt;     // pattern id ending exactly at state, or -1
  final int[] out;       // dictionary suffix link: nearest accepting suffix state (or 0)
  final int[] patLen;    // byte length per pattern (for span painting)
  public final int nPatterns;

  public AhoAutomaton(String[] patterns) {
    int maxStates = 1;
    byte[][] pb = new byte[patterns.length][];
    for (int i = 0; i < patterns.length; i++) {
      pb[i] = patterns[i].getBytes(StandardCharsets.UTF_8);
      if (pb[i].length == 0) {
        throw new IllegalArgumentException("empty pattern at index " + i);
      }
      maxStates += pb[i].length;
    }
    nPatterns = patterns.length;
    patLen = new int[patterns.length];
    for (int i = 0; i < pb.length; i++) {
      patLen[i] = pb[i].length;
    }
    go = new int[maxStates][256];
    fail = new int[maxStates];
    patAt = new int[maxStates];
    out = new int[maxStates];
    java.util.Arrays.fill(patAt, -1);
    int nStates = 1;
    // trie
    for (int p = 0; p < pb.length; p++) {
      int s = 0;
      for (byte b : pb[p]) {
        int c = b & 0xFF;
        if (go[s][c] == 0) {
          go[s][c] = nStates++;
        }
        s = go[s][c];
      }
      if (patAt[s] >= 0) {
        throw new IllegalArgumentException("duplicate pattern: " + patterns[p]);
      }
      patAt[s] = p;
    }
    // BFS: fail links, goto completion (automaton form), suffix links
    ArrayDeque<Integer> q = new ArrayDeque<>();
    for (int c = 0; c < 256; c++) {
      int s = go[0][c];
      if (s != 0) {
        fail[s] = 0;
        q.add(s);
      }
    }
    while (!q.isEmpty()) {
      int s = q.poll();
      out[s] = patAt[fail[s]] >= 0 ? fail[s] : out[fail[s]];
      for (int c = 0; c < 256; c++) {
        int t = go[s][c];
        if (t != 0) {
          fail[t] = go[fail[s]][c];
          q.add(t);
        } else {
          go[s][c] = go[fail[s]][c];
        }
      }
    }
  }

  /** Count every occurrence of every pattern in `text` (overlapping and
   *  nested matches all counted): one byte pass, per-position match
   *  enumeration via the dictionary suffix chain. Returns one count
   *  per pattern, input order.
   */
  public long[] countAll(byte[] text) {
    long[] counts = new long[nPatterns];
    int s = 0;
    for (byte value : text) {
      s = go[s][value & 0xFF];
      int m = patAt[s] >= 0 ? s : out[s];
      while (m != 0) {
        counts[patAt[m]]++;
        m = out[m];
      }
    }
    return counts;
  }

  /** REDACT: replace every byte covered by ANY pattern occurrence
   *  (the union of all matched spans — overlapping and nested
   *  included) with `mask`. Patterns are ASCII in the redaction use,
   *  so masking exactly the matched bytes cannot split a multi-byte
   *  character. Same single pass as {@link #countAll} plus a painted
   *  frontier: per end position only the LONGEST accepting suffix
   *  matters (its span covers every shorter one), and the frontier
   *  keeps total painting O(text).
   */
  public byte[] maskAll(byte[] text, byte mask) {
    byte[] outBytes = text.clone();
    int s = 0;
    int painted = 0; // positions < painted are already masked
    for (int i = 0; i < text.length; i++) {
      s = go[s][text[i] & 0xFF];
      int m = patAt[s] >= 0 ? s : out[s];
      int longest = 0;
      while (m != 0) {
        int len = patLen[patAt[m]];
        if (len > longest) {
          longest = len;
        }
        m = out[m];
      }
      if (longest > 0) {
        for (int j = Math.max(i - longest + 1, painted); j <= i; j++) {
          outBytes[j] = mask;
        }
        painted = i + 1;
      }
    }
    return outBytes;
  }

  /** Size of the span union {@link #maskAll} paints — the number of
   *  bytes covered by ANY pattern occurrence — computed WITHOUT
   *  allocating or scanning the masked copy, so redaction accounting
   *  never depends on counting the mask character in the output (which
   *  would miscount on texts that already contain it). Same frontier
   *  walk as {@link #maskAll}.
   */
  public long maskedCount(byte[] text) {
    long covered = 0;
    int s = 0;
    int painted = 0;
    for (int i = 0; i < text.length; i++) {
      s = go[s][text[i] & 0xFF];
      int m = patAt[s] >= 0 ? s : out[s];
      int longest = 0;
      while (m != 0) {
        int len = patLen[patAt[m]];
        if (len > longest) {
          longest = len;
        }
        m = out[m];
      }
      if (longest > 0) {
        covered += (i + 1) - Math.max(i - longest + 1, painted);
        painted = i + 1;
      }
    }
    return covered;
  }
}
