package graft.functions;

import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.security.NoSuchAlgorithmException;
import java.util.LinkedHashSet;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData;
import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.GenericArrayData;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Row-at-a-time kernels behind the graft custom expressions. Each method
 * is called from both the interpreted {@code eval} and the generated code
 * (same JIT-compiled body either way), so Spark's whole-stage codegen
 * spans stay unbroken and the per-row cost is a single static call —
 * unlike higher-order-function expression trees, which Catalyst always
 * evaluates interpreted.
 *
 * Hash semantics are bit-identical to the SQL definitions used by the
 * DuckDB oracle: hash60(s) = first 15 hex chars of md5(s) read base-16
 * (= conv(substring(md5(s),1,15),16,10)).
 */
public final class GraftStrings {
  private GraftStrings() {}

  private static final ThreadLocal<MessageDigest> MD5 =
      ThreadLocal.withInitial(() -> {
        try {
          return MessageDigest.getInstance("MD5");
        } catch (NoSuchAlgorithmException e) {
          throw new IllegalStateException(e);
        }
      });

  /** First 60 bits of md5(utf8(s)), as the base-16 value of the first 15
   *  hex chars — matches {@code conv(substring(md5(c),1,15),16,10)}. */
  public static long hash60(String s) {
    MessageDigest md = MD5.get();
    md.reset();
    byte[] d = md.digest(s.getBytes(StandardCharsets.UTF_8));
    long v = 0L;
    for (int i = 0; i < 7; i++) {
      v = (v << 8) | (d[i] & 0xffL);
    }
    return (v << 4) | ((d[7] >> 4) & 0xfL);
  }

  /** Whitespace tokens of the space-trimmed input — identical to
   *  {@code split(trim(text), "\\s+")}: UTF8String.trim() trims ASCII
   *  space only (NOT all whitespace, unlike java.lang.String#trim), and
   *  the split is java.util.regex with limit -1, exactly what Spark's
   *  StringSplit does. */
  public static String[] tokens(UTF8String text) {
    return text.trim().toString().split("\\s+", -1);
  }

  /** The space-joined n-gram starting at token i — THE single
   *  definition of gram construction; wordShingles, minhash (via
   *  wordShingles) and repetitionStats must agree byte-for-byte or
   *  their DuckDB-oracle hash parity silently breaks per caller. */
  private static String gram(String[] toks, int i, int n, StringBuilder sb) {
    sb.setLength(0);
    for (int j = 0; j < n; j++) {
      if (j > 0) sb.append(' ');
      sb.append(toks[i + j]);
    }
    return sb.toString();
  }

  /** Distinct word n-gram shingles in first-occurrence order — identical
   *  to array_distinct(filter(transform(split(trim(text),"\\s+"), ...)))
   *  over slice+concat_ws(" "). */
  public static ArrayData wordShingles(UTF8String text, int n) {
    String[] toks = tokens(text);
    if (toks.length < n) {
      return new GenericArrayData(new Object[0]);
    }
    LinkedHashSet<String> out = new LinkedHashSet<>();
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i + n <= toks.length; i++) {
      out.add(gram(toks, i, n, sb));
    }
    Object[] arr = new Object[out.size()];
    int i = 0;
    for (String s : out) {
      arr[i++] = UTF8String.fromString(s);
    }
    return new GenericArrayData(arr);
  }

  /** True iff {@code b} is one of the ASCII bytes Java's regex
   *  {@code \s} matches: space, tab, LF, VT, FF, CR. Multi-byte UTF-8
   *  sequences are all ≥ 0x80, so byte-level scanning can never split
   *  inside a code point. */
  private static boolean isSpace(byte b) {
    return b == 0x20 || (b >= 0x09 && b <= 0x0d);
  }

  /** hash60 of each distinct word n-gram shingle, first-occurrence
   *  order — the fused, byte-level form of
   *  {@code explode(wordShingles(text, n))} followed by
   *  {@code conv(substring(md5(shingle),1,15),16,10)}: same hash
   *  values, but tokenization, gram assembly and md5 all run on the
   *  UTF-8 bytes (UTF-8 concatenation is byte concatenation, so the
   *  gram bytes equal the encoded gram string) with zero per-gram
   *  allocation — no UTF8String shingle rows, no String round trip, no
   *  hex-digest parsing, no MessageDigest. On the inverted-index dedup
   *  path that per-gram work runs inside the scan task, which a
   *  single-row-group input executes SERIALIZED — it was the dominant
   *  small-input constant (and at any scale it is pure per-row CPU).
   *
   *  Token edge semantics replicate {@link #tokens}: ASCII-space-only
   *  trim, then regex-{@code \s+} splitting with limit -1, which keeps
   *  an empty first/last token when the trimmed text starts/ends with
   *  non-space whitespace (TokensSpec pins the parity on adversarial
   *  inputs).
   *
   *  Distinctness is by the 60-bit hash itself rather than by shingle
   *  string: two distinct shingles of one document colliding in 60
   *  bits (probability ~m²/2⁶¹ per doc) would shorten the array by
   *  one entry — the same immateriality argument the inverted index
   *  already makes for bucketing by this hash, and natural-text grams
   *  cannot be adversarial md5-collision blocks. */
  public static ArrayData wordShingleHashes(UTF8String text, int n) {
    return gramHashes(text, n, true);
  }

  /** Positional variant: hash60 of the n-token gram starting at EVERY
   *  token position, in order, duplicates kept — length
   *  max(0, numTokens - n + 1). The fused form of
   *  {@code posexplode(tokenChunks(text, n, 1))} restricted to
   *  full-length windows and hashed — the span-detection family's
   *  per-position stream without chunk-string rows. */
  public static ArrayData tokenGramHashes(UTF8String text, int n) {
    return gramHashes(text, n, false);
  }

  private static ArrayData gramHashes(UTF8String text, int n, boolean distinct) {
    byte[] b = text.trim().getBytes();
    int len = b.length;
    // token boundaries (offsets): replicate split("\\s+", -1) incl.
    // empty edge tokens
    // non-empty tokens are >=1 byte separated by >=1 byte, empty tokens
    // occur only at the two edges => at most len/2 + 3 tokens
    int maxToks = len / 2 + 3;
    int[] tokStart = new int[maxToks];
    int[] tokEnd = new int[maxToks];
    int m = 0;
    if (len == 0) {
      tokStart[0] = 0;
      tokEnd[0] = 0;
      m = 1;
    } else {
      int i = 0;
      if (isSpace(b[0])) { // leading separator run => empty first token
        tokStart[m] = 0;
        tokEnd[m] = 0;
        m++;
        while (i < len && isSpace(b[i])) i++;
      }
      while (i < len) {
        int s = i;
        while (i < len && !isSpace(b[i])) i++;
        tokStart[m] = s;
        tokEnd[m] = i;
        m++;
        if (i < len) { // separator run
          while (i < len && isSpace(b[i])) i++;
          if (i == len) { // trailing separator run => empty last token
            tokStart[m] = len;
            tokEnd[m] = len;
            m++;
          }
        }
      }
    }
    int grams = m - n + 1;
    if (grams <= 0) {
      return UnsafeArrayData.fromPrimitiveArray(new long[0]);
    }
    // open-addressing long set (insertion-ordered output, only used
    // when distinct); hash60 values are < 2^60, so -1 is a safe empty
    // sentinel
    int cap = distinct ? Integer.highestOneBit(Math.max(4, grams * 4 - 1)) << 1 : 0;
    long[] set = distinct ? new long[cap] : null;
    if (distinct) {
      java.util.Arrays.fill(set, -1L);
    }
    long[] out = new long[grams];
    int nOut = 0;
    byte[] scratch = new byte[64];
    for (int g = 0; g < grams; g++) {
      int glen = n - 1; // single-space joiners
      for (int j = 0; j < n; j++) {
        glen += tokEnd[g + j] - tokStart[g + j];
      }
      if (glen > scratch.length) {
        scratch = new byte[Integer.highestOneBit(glen) << 1];
      }
      int p = 0;
      for (int j = 0; j < n; j++) {
        if (j > 0) scratch[p++] = 0x20;
        int tl = tokEnd[g + j] - tokStart[g + j];
        System.arraycopy(b, tokStart[g + j], scratch, p, tl);
        p += tl;
      }
      long h = GraftMd5.hash60(scratch, 0, glen);
      if (distinct) {
        int slot = (int) (h ^ (h >>> 29)) & (cap - 1);
        while (set[slot] != -1L && set[slot] != h) {
          slot = (slot + 1) & (cap - 1);
        }
        if (set[slot] == -1L) {
          set[slot] = h;
          out[nOut++] = h;
        }
      } else {
        out[nOut++] = h;
      }
    }
    return UnsafeArrayData.fromPrimitiveArray(
        nOut == grams ? out : java.util.Arrays.copyOf(out, nOut));
  }

  /** Consecutive token-hash pairs (h_i, h_{i+1}) in position order,
   *  duplicates kept — the bigram stream WITH its component hashes,
   *  which the single-long gram hash of tokenGramHashes(text, 2)
   *  cannot provide (Kneser-Ney needs history- and continuation-keyed
   *  aggregates over the same pairs). Fused form of zipping
   *  tokenGramHashes(text, 1) against its own tail via
   *  transform(sequence(...), i -> struct(g[i], g[i+1])) — that HOF
   *  chain evaluates interpreted per element; this is one primitive
   *  hash pass and one struct row per pair. */
  public static ArrayData tokenPairHashes(UTF8String text) {
    long[] hs = tokenGramHashes(text, 1).toLongArray();
    if (hs.length < 2) {
      return new GenericArrayData(new Object[0]);
    }
    Object[] out = new Object[hs.length - 1];
    for (int i = 0; i + 1 < hs.length; i++) {
      GenericInternalRow r = new GenericInternalRow(2);
      r.update(0, hs[i]);
      r.update(1, hs[i + 1]);
      out[i] = r;
    }
    return new GenericArrayData(out);
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
   *  the distinct window-minima of the positional n-gram hash stream —
   *  min over hashes[i .. min(i+w, m)-1] for every position i
   *  (right-edge partial windows kept, matching the query face's
   *  documented superset-selection and the oracle's identical frame).
   *  Fused form of explode(array_distinct(transform(sequence(...),
   *  i -> array_min(slice(tokenGramHashes(text,n), i+1, w))))) — the
   *  HOF chain evaluates interpreted and allocates a slice array per
   *  gram; this is one primitive pass (O(m·w) compares, w is small by
   *  construction) with the same open-addressing dedup as
   *  wordShingleHashes. Output order is first-occurrence; consumers
   *  treat it as a set. */
  public static ArrayData winnowHashes(UTF8String text, int n, int w) {
    long[] hs = tokenGramHashes(text, n).toLongArray();
    int m = hs.length;
    if (m == 0) {
      return UnsafeArrayData.fromPrimitiveArray(new long[0]);
    }
    int cap = Integer.highestOneBit(Math.max(4, m * 4 - 1)) << 1;
    long[] set = new long[cap];
    java.util.Arrays.fill(set, -1L);
    long[] out = new long[m];
    int nOut = 0;
    for (int i = 0; i < m; i++) {
      long min = hs[i];
      int end = Math.min(i + w, m);
      for (int j = i + 1; j < end; j++) {
        if (hs[j] < min) min = hs[j];
      }
      int slot = (int) (min ^ (min >>> 29)) & (cap - 1);
      while (set[slot] != -1L && set[slot] != min) {
        slot = (slot + 1) & (cap - 1);
      }
      if (set[slot] == -1L) {
        set[slot] = min;
        out[nOut++] = min;
      }
    }
    return UnsafeArrayData.fromPrimitiveArray(
        nOut == m ? out : java.util.Arrays.copyOf(out, nOut));
  }

  /** MinHash signature over distinct word n-gram shingles, map-only:
   *  h = hash60(shingle) mod p; sig[i] = min over shingles of
   *  (h * a_i + b_i) mod p with p = 2^31-1, a_i = 2i+3,
   *  b_i = 104729*(i+1) mod p — the SAME permutation constants as
   *  graft.ops.Dedup.minhashParams (and the DuckDB oracle). Returns null
   *  handled by the expression; docs with fewer than n tokens yield no
   *  shingles and map to null (matching the explode+groupBy formulation,
   *  which emits no row for them). All intermediates fit int64:
   *  h mod p < 2^31, a_i < 2^31 => product < 2^62. */
  public static long[] minHashSig(UTF8String text, int n, int k) {
    final long p = 2147483647L;
    // hashed-shingle fast path: the permuted values depend on the
    // shingle only through hash60, so iterating distinct hashes is
    // exactly equivalent to iterating distinct shingles (even a 60-bit
    // dedup collision cannot change any min — equal h, equal permuted
    // values) while skipping the String/MessageDigest round trip
    ArrayData hs = wordShingleHashes(text, n);
    int m = hs.numElements();
    if (m == 0) return null;
    long[] sig = new long[k];
    java.util.Arrays.fill(sig, Long.MAX_VALUE);
    for (int s = 0; s < m; s++) {
      long h = hs.getLong(s) % p;
      for (int i = 0; i < k; i++) {
        long a = 2L * i + 3L;
        long b = (104729L * (i + 1)) % p;
        long v = (h * a + b) % p;
        if (v < sig[i]) sig[i] = v;
      }
    }
    return sig;
  }

  /** ArrayData face of minHashSig for the MinHashSig expression; null
   *  when the document has no shingles. */
  public static ArrayData minHashSigArray(UTF8String text, int n, int k) {
    long[] sig = minHashSig(text, n, k);
    return sig == null ? null : UnsafeArrayData.fromPrimitiveArray(sig);
  }

  /** Overlapping token-window chunks (RAG / context-window prep): chunk
   *  j covers tokens [j*stride, j*stride + window), windows start at
   *  every stride step while the start is in range, the final windows
   *  truncate at the end of the document. Equivalent to the DuckDB
   *  comprehension
   *  {@code [array_to_string(t[i:i+window-1],' ') for i in range(1, len(t)+1, stride)]}.
   */
  public static ArrayData tokenChunks(UTF8String text, int window, int stride) {
    String[] toks = tokens(text);
    int n = toks.length;
    java.util.ArrayList<Object> out = new java.util.ArrayList<>();
    StringBuilder sb = new StringBuilder();
    for (int start = 0; start < n; start += stride) {
      int end = Math.min(start + window, n);
      sb.setLength(0);
      for (int i = start; i < end; i++) {
        if (i > start) sb.append(' ');
        sb.append(toks[i]);
      }
      out.add(UTF8String.fromString(sb.toString()));
    }
    return new GenericArrayData(out.toArray());
  }

  /** 60-bit SimHash over whitespace tokens: every token (duplicates
   *  included) votes ±1 per bit of its hash60; signature bit i is set iff
   *  the vote sum is positive. Bit-identical to the aggregate/transform
   *  formulation in graft.ops.Dedup.simHash. */
  public static long simHash60(UTF8String text) {
    String[] toks = tokens(text);
    int[] votes = new int[60];
    for (String t : toks) {
      long h = hash60(t);
      for (int i = 0; i < 60; i++) {
        votes[i] += ((h >> i) & 1L) == 1L ? 1 : -1;
      }
    }
    long sig = 0L;
    for (int i = 0; i < 60; i++) {
      if (votes[i] > 0) sig |= 1L << i;
    }
    return sig;
  }

  /** Gopher-style repetition quality signals, one pass over the tokens:
   *  (top_frac, dup_frac, dup_large_frac) where top_frac = occurrences
   *  of the most frequent nSmall-gram / total nSmall-grams, dup_frac =
   *  1 - distinct/total nSmall-grams, dup_large_frac = the same for
   *  nLarge-grams (repeated long phrases — boilerplate). Fields are
   *  null when the document is too short to have such a gram, matching
   *  the SQL formulation (no gram rows -> NULL aggregate). Division
   *  order matches the oracle: (double) x / total, subtracted from 1.
   */
  /** Per-term token frequencies plus total token count in ONE
   *  byte-level pass: out[i] = occurrences of terms[i] among the
   *  whitespace tokens of the trimmed input (same token boundaries as
   *  {@link #tokens}: ASCII-space trim, {@code \s}-run separators,
   *  the empty input contributing one empty token), out[terms.length]
   *  = the token count (== {@code size(split(trim(text),"\\s+"))}).
   *  Terms must be distinct, so a token increments at most one
   *  counter. Tokens are compared byte-wise against the UTF-8 term
   *  bytes — no String materialization, no per-token allocation. The
   *  fused form of the explode(tokens)+isin+groupBy tf build AND the
   *  tokenCount length pass used by the BM25 family: one scan yields
   *  the whole sufficient statistic for scoring a document against
   *  every query term at once. */
  public static ArrayData termFreqs(UTF8String text, byte[][] terms) {
    byte[] b = text.trim().getBytes();
    int len = b.length;
    int[] out = new int[terms.length + 1];
    if (len == 0) {
      out[terms.length] = 1; // split("", "\\s+", -1) == [""]
      return UnsafeArrayData.fromPrimitiveArray(out);
    }
    int i = 0;
    int m = 0;
    while (i < len) {
      int s = i;
      while (i < len && !isSpace(b[i])) i++;
      m++;
      int tl = i - s;
      for (int t = 0; t < terms.length; t++) {
        byte[] tb = terms[t];
        if (tb.length != tl) continue;
        boolean eq = true;
        for (int j = 0; j < tl; j++) {
          if (b[s + j] != tb[j]) { eq = false; break; }
        }
        if (eq) { out[t]++; break; } // distinct terms: at most one match
      }
      while (i < len && isSpace(b[i])) i++;
    }
    if (isSpace(b[len - 1])) {
      // split(.., "\\s+", -1) keeps one trailing empty token when the
      // trimmed text ends in non-space whitespace (\t/\n/\r — ASCII-space
      // trim leaves it); the leading counterpart falls out of the main
      // loop (first iteration yields tl == 0), this edge does not.
      m++;
      for (int t = 0; t < terms.length; t++) {
        if (terms[t].length == 0) { out[t]++; break; }
      }
    }
    out[terms.length] = m;
    return UnsafeArrayData.fromPrimitiveArray(out);
  }

  /** Per-document (term, tf) entries in ONE byte-level pass: the
   *  distinct whitespace tokens of the trimmed input, each with its
   *  occurrence count — the fused form of
   *  {@code explode(tokens) + groupBy(doc, term).count()}, which costs
   *  a corpus-token-sized EXCHANGE that this kernel removes entirely
   *  (the entries are per-row, so the tf build is map-side by
   *  construction). Token boundaries are exactly {@link #tokens}' /
   *  {@link #termFreqs}': ASCII-space trim, {@code \s}-run separators,
   *  the empty input contributing one empty token, plus the trailing
   *  empty-token edge. Entry order is first occurrence; consumers
   *  aggregate or sort, never rely on it. */
  public static ArrayData termTfEntries(UTF8String text) {
    byte[] b = text.trim().getBytes();
    int len = b.length;
    java.util.LinkedHashMap<UTF8String, long[]> counts =
        new java.util.LinkedHashMap<>();
    if (len == 0) {
      counts.put(UTF8String.EMPTY_UTF8, new long[] {1L});
    } else {
      int i = 0;
      while (i < len) {
        int s = i;
        while (i < len && !isSpace(b[i])) i++;
        UTF8String tok = UTF8String.fromBytes(b, s, i - s);
        long[] c = counts.get(tok);
        if (c == null) counts.put(tok, new long[] {1L}); else c[0]++;
        while (i < len && isSpace(b[i])) i++;
      }
      if (isSpace(b[len - 1])) { // trailing empty token (see termFreqs)
        long[] c = counts.get(UTF8String.EMPTY_UTF8);
        if (c == null) counts.put(UTF8String.EMPTY_UTF8, new long[] {1L});
        else c[0]++;
      }
    }
    Object[] out = new Object[counts.size()];
    int j = 0;
    for (java.util.Map.Entry<UTF8String, long[]> e : counts.entrySet()) {
      GenericInternalRow r = new GenericInternalRow(2);
      r.update(0, e.getKey());
      r.update(1, e.getValue()[0]);
      out[j++] = r;
    }
    return new GenericArrayData(out);
  }

  /** WordPiece greedy longest-match-first segmentation (Schuster &amp;
   *  Nakajima, ICASSP 2012; the BERT tokenizer's encode rule): from the
   *  left, repeatedly consume the LONGEST vocabulary piece that
   *  prefixes the remainder — word-start positions match against
   *  {@code plain} pieces, every later position against {@code cont}
   *  ("##") pieces (stored WITHOUT the ## marker; it is presentation,
   *  not content). Returns the piece count, or -1 when some position
   *  has no matching piece (impossible once both vocab arrays contain
   *  all single characters of the word's alphabet; the expression
   *  wrapper surfaces -1 as NULL rather than a wrong count). Ties
   *  cannot occur: two distinct pieces of equal length cannot both
   *  prefix the same remainder. Byte-wise compares against the UTF-8
   *  piece bytes — no String materialization, O(|vocab|·|word|) with
   *  zero allocation, one call per DISTINCT word (the callers run it
   *  over the word-count table, never the running text). */
  public static int wordpiecePieces(UTF8String word, byte[][] plain,
      byte[][] cont) {
    byte[] b = word.getBytes();
    int pos = 0;
    int n = 0;
    while (pos < b.length) {
      byte[][] vocab = (pos == 0) ? plain : cont;
      int best = 0;
      for (byte[] p : vocab) {
        if (p.length <= best || p.length > b.length - pos) continue;
        boolean eq = true;
        for (int j = 0; j < p.length; j++) {
          if (b[pos + j] != p[j]) { eq = false; break; }
        }
        if (eq) best = p.length;
      }
      if (best == 0) return -1;
      pos += best;
      n++;
    }
    return n;
  }

  /** MINIMUM-TOKEN segmentation count — the shortest-path DP objective
   *  of PathPiece (Schmidt et al., "Tokenization Is More Than
   *  Compression", EMNLP 2024) over the same two-half vocabulary as
   *  {@link #wordpiecePieces}: dp[i] = fewest pieces covering the
   *  suffix starting at byte i, dp[i] = 1 + min over vocabulary pieces
   *  matching at i of dp[i + |piece|] (word-start positions match
   *  {@code plain}, later positions {@code cont}). Returns dp[0], or
   *  -1 when the word is uncoverable (then so is greedy's walk — the
   *  callers guarantee coverage with single-char pieces in both
   *  halves). Always &le; the greedy count: greedy's walk is one path
   *  through the same lattice. O(|vocab|·|word|) like the greedy
   *  kernel, one small int[] allocation, one call per DISTINCT word. */
  public static int minPieces(UTF8String word, byte[][] plain,
      byte[][] cont) {
    byte[] b = word.getBytes();
    if (b.length == 0) return 0;
    int[] dp = new int[b.length + 1];
    java.util.Arrays.fill(dp, -1);
    dp[b.length] = 0;
    for (int i = b.length - 1; i >= 0; i--) {
      byte[][] vocab = (i == 0) ? plain : cont;
      int best = -1;
      for (byte[] p : vocab) {
        if (p.length > b.length - i || dp[i + p.length] < 0) continue;
        int via = dp[i + p.length] + 1;
        if (best >= 0 && via >= best) continue;
        boolean eq = true;
        for (int j = 0; j < p.length; j++) {
          if (b[i + j] != p[j]) { eq = false; break; }
        }
        if (eq) best = via;
      }
      dp[i] = best;
    }
    return dp[0];
  }

  /** WordPiece greedy segmentation emitting VOCABULARY IDS — the same
   *  longest-match-first walk as {@link #wordpiecePieces} but returning
   *  the id of each consumed piece ({@code plainIds[i]} pairs with
   *  {@code plain[i]}, likewise cont). Returns null when a position is
   *  uncoverable (cannot happen once both halves hold all single
   *  characters of the word's alphabet). One call per word occurrence,
   *  zero exchanges in the callers — the encode-to-model-input step of
   *  the tokenizer family. */
  public static ArrayData wordpieceIds(UTF8String word, byte[][] plain,
      int[] plainIds, byte[][] cont, int[] contIds) {
    byte[] b = word.getBytes();
    int[] out = new int[b.length]; // >= 1 piece per char is the max
    int pos = 0;
    int n = 0;
    while (pos < b.length) {
      byte[][] vocab = (pos == 0) ? plain : cont;
      int[] ids = (pos == 0) ? plainIds : contIds;
      int best = 0;
      int bestId = -1;
      for (int t = 0; t < vocab.length; t++) {
        byte[] p = vocab[t];
        if (p.length <= best || p.length > b.length - pos) continue;
        boolean eq = true;
        for (int j = 0; j < p.length; j++) {
          if (b[pos + j] != p[j]) { eq = false; break; }
        }
        if (eq) { best = p.length; bestId = ids[t]; }
      }
      if (best == 0) return null;
      out[n++] = bestId;
      pos += best;
    }
    return UnsafeArrayData.fromPrimitiveArray(
        n == out.length ? out : java.util.Arrays.copyOf(out, n));
  }

  public static InternalRow repetitionStats(UTF8String text, int nSmall,
      int nLarge) {
    String[] toks = tokens(text);
    Object[] out = new Object[3];
    StringBuilder sb = new StringBuilder();
    int totalS = toks.length - nSmall + 1;
    if (totalS > 0) {
      java.util.HashMap<String, Integer> freq = new java.util.HashMap<>();
      int maxCnt = 0;
      for (int i = 0; i < totalS; i++) {
        int c = freq.merge(gram(toks, i, nSmall, sb), 1, Integer::sum);
        if (c > maxCnt) maxCnt = c;
      }
      out[0] = (double) maxCnt / totalS;
      out[1] = 1 - (double) freq.size() / totalS;
    }
    int totalL = toks.length - nLarge + 1;
    if (totalL > 0) {
      java.util.HashSet<String> distinct = new java.util.HashSet<>();
      for (int i = 0; i < totalL; i++) {
        distinct.add(gram(toks, i, nLarge, sb));
      }
      out[2] = 1 - (double) distinct.size() / totalL;
    }
    return new GenericInternalRow(out);
  }

  /** Unigram-LM Viterbi DP key for one word (Kudo, ACL 2018 — the
   *  SentencePiece default model): the min over segmentations of
   *  &Sigma; cost(piece), where each transition adds
   *  {@code costs1024[t] + 1} to a combined key = totalCost·1024 +
   *  pieceCount — cost in the high bits, piece count in the low 10, so
   *  one int64 min gives "least cost, then fewest pieces" with no
   *  separate tie-break. Costs arrive PRE-SCALED by 1024 (the caller
   *  computes (log2fp(T) − log2fp(c))·1024 on the driver); word length
   *  is capped well below 1024 pieces by the callers' token domain.
   *  Returns -1 when some position is uncoverable (the callers include
   *  every domain single character, so in practice never). Same
   *  suffix-DP shape as {@link #minPieces}: O(|vocab|·|word|), one
   *  long[] allocation, one call per DISTINCT word. The DuckDB oracle
   *  replays the identical recurrence (its list-carrying backward
   *  recursion computes the same dp array). */
  public static long unigramDpKey(UTF8String word, byte[][] pieces,
      long[] costs1024) {
    byte[] b = word.getBytes();
    if (b.length == 0) return 0;
    long[] dp = new long[b.length + 1];
    java.util.Arrays.fill(dp, -1L);
    dp[b.length] = 0;
    for (int i = b.length - 1; i >= 0; i--) {
      long best = -1;
      for (int t = 0; t < pieces.length; t++) {
        byte[] p = pieces[t];
        if (p.length > b.length - i || dp[i + p.length] < 0) continue;
        long via = dp[i + p.length] + costs1024[t] + 1;
        if (best >= 0 && via >= best) continue;
        boolean eq = true;
        for (int j = 0; j < p.length; j++) {
          if (b[i + j] != p[j]) { eq = false; break; }
        }
        if (eq) best = via;
      }
      dp[i] = best;
    }
    return dp[0];
  }

  /** Unigram-LM Viterbi segmentation emitting PIECE INDEXES (positions
   *  into the {@code pieces} array) — the E-step workhorse behind the
   *  unigram fit's expected-count rounds and the ids face. Same DP as
   *  {@link #unigramDpKey} plus the path walk; the per-position choice
   *  tie-break is (least key, then LONGEST piece), matching the
   *  oracle's combo = (cost + dp + 1)·16 + (8 − l) argmin — ties
   *  between distinct pieces of equal length are impossible (equal
   *  length + same position ⇒ same substring). Returns null on an
   *  uncoverable word. */
  public static ArrayData unigramSegPieces(UTF8String word, byte[][] pieces,
      long[] costs1024) {
    byte[] b = word.getBytes();
    if (b.length == 0) return UnsafeArrayData.fromPrimitiveArray(new int[0]);
    long[] dp = new long[b.length + 1];
    int[] choice = new int[b.length];
    java.util.Arrays.fill(dp, -1L);
    dp[b.length] = 0;
    for (int i = b.length - 1; i >= 0; i--) {
      long best = -1;
      int bestT = -1;
      int bestL = 0;
      for (int t = 0; t < pieces.length; t++) {
        byte[] p = pieces[t];
        if (p.length > b.length - i || dp[i + p.length] < 0) continue;
        long via = dp[i + p.length] + costs1024[t] + 1;
        if (best >= 0 && (via > best || (via == best && p.length <= bestL)))
          continue;
        boolean eq = true;
        for (int j = 0; j < p.length; j++) {
          if (b[i + j] != p[j]) { eq = false; break; }
        }
        if (eq) { best = via; bestT = t; bestL = p.length; }
      }
      dp[i] = best;
      choice[i] = bestT;
    }
    if (dp[0] < 0) return null;
    int[] out = new int[b.length];
    int pos = 0;
    int n = 0;
    while (pos < b.length) {
      int t = choice[pos];
      out[n++] = t;
      pos += pieces[t].length;
    }
    return UnsafeArrayData.fromPrimitiveArray(
        n == out.length ? out : java.util.Arrays.copyOf(out, n));
  }
}
