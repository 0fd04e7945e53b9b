package graft.functions;

import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.GenericArrayData;

/**
 * Static kernel for media-header parsing, called from the codegen'd
 * {@code ImageDims} expression (one call per payload inside whole-stage
 * codegen). Real parsers for the three public image container formats —
 * dimensions come out of the actual header bytes, not a stub:
 *
 *  - PNG  (https://www.w3.org/TR/png-3/): 8-byte signature, then the
 *    IHDR chunk; width/height are big-endian u32 at offsets 16/20.
 *  - GIF  (GIF87a/GIF89a): 6-byte signature, then the logical screen
 *    descriptor; width/height are little-endian u16 at offsets 6/8.
 *  - JPEG (ISO/IEC 10918 JFIF marker stream): walk marker segments from
 *    SOI until a frame header (SOF0..SOF15 minus DHT/JPG/DAC); height
 *    and width are big-endian u16 at segment offsets 5/7.
 *
 * Returns {formatCode, width, height} with format 1=png 2=jpeg 3=gif,
 * or null when the payload is not a recognized image — callers surface
 * that as SQL NULL rather than failing the task on opaque/corrupt
 * payloads (at 100 TB there are always some).
 */
public final class GraftMedia {
    private GraftMedia() {}

    public static final int FMT_PNG = 1;
    public static final int FMT_JPEG = 2;
    public static final int FMT_GIF = 3;

    private static int u8(byte[] b, int i) { return b[i] & 0xFF; }

    private static long be32(byte[] b, int i) {
        return ((long) u8(b, i) << 24) | (u8(b, i + 1) << 16)
                | (u8(b, i + 2) << 8) | u8(b, i + 3);
    }

    private static int be16(byte[] b, int i) {
        return (u8(b, i) << 8) | u8(b, i + 1);
    }

    private static int le16(byte[] b, int i) {
        return u8(b, i) | (u8(b, i + 1) << 8);
    }

    /** {format, width, height}, or null if not a recognized image. */
    public static int[] dims(byte[] b) {
        if (b == null) return null;
        int[] r = pngDims(b);
        if (r == null) r = jpegDims(b);
        if (r == null) r = gifDims(b);
        return r;
    }

    /** dims() boxed for the codegen'd expression: ArrayData or null. */
    public static ArrayData dimsArray(byte[] b) {
        int[] d = dims(b);
        if (d == null) return null;
        return new GenericArrayData(new Object[] { d[0], d[1], d[2] });
    }

    static int[] pngDims(byte[] b) {
        // signature + IHDR length/type/data: need 24 bytes to read dims
        if (b.length < 24) return null;
        if (u8(b, 0) != 0x89 || b[1] != 'P' || b[2] != 'N' || b[3] != 'G'
                || u8(b, 4) != 0x0D || u8(b, 5) != 0x0A
                || u8(b, 6) != 0x1A || u8(b, 7) != 0x0A) return null;
        // first chunk must be IHDR (13 bytes of data)
        if (be32(b, 8) != 13 || b[12] != 'I' || b[13] != 'H'
                || b[14] != 'D' || b[15] != 'R') return null;
        long w = be32(b, 16);
        long h = be32(b, 20);
        if (w <= 0 || h <= 0 || w > Integer.MAX_VALUE || h > Integer.MAX_VALUE)
            return null;
        return new int[] { FMT_PNG, (int) w, (int) h };
    }

    static int[] gifDims(byte[] b) {
        if (b.length < 10) return null;
        if (b[0] != 'G' || b[1] != 'I' || b[2] != 'F' || b[3] != '8'
                || (b[4] != '7' && b[4] != '9') || b[5] != 'a') return null;
        int w = le16(b, 6);
        int h = le16(b, 8);
        if (w == 0 || h == 0) return null;
        return new int[] { FMT_GIF, w, h };
    }

    static int[] jpegDims(byte[] b) {
        if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null;
        int i = 2;
        while (i + 3 < b.length) {
            if (u8(b, i) != 0xFF) return null; // lost marker sync
            int marker = u8(b, i + 1);
            if (marker == 0xFF) { i++; continue; }         // fill byte
            if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
                i += 2;                                    // standalone marker
                continue;
            }
            if (marker == 0xD9 || marker == 0xDA) return null; // EOI/SOS: no SOF seen
            int len = be16(b, i + 2);
            if (len < 2) return null;
            boolean isSof = marker >= 0xC0 && marker <= 0xCF
                    && marker != 0xC4 && marker != 0xC8 && marker != 0xCC;
            if (isSof) {
                if (i + 8 >= b.length) return null;
                int h = be16(b, i + 5);
                int w = be16(b, i + 7);
                if (w == 0 || h == 0) return null;
                return new int[] { FMT_JPEG, w, h };
            }
            i += 2 + len;
        }
        return null;
    }
}
