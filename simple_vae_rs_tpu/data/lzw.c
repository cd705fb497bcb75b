/* TIFF-variant LZW decoder (TIFF 6.0 §13, libtiff-compatible early change).
 *
 * Native counterpart of the pure-Python decoder in tiffio.py: the Python
 * loop runs at a few MB/s, which would make tile decode the data-pipeline
 * bottleneck on real compressed Sen2Venus tiles; this one runs at memory
 * speed. Built on demand by data/lzw_native.py (cc -O3 -shared -fPIC) and
 * loaded via ctypes; tiffio falls back to the Python decoder when no C
 * toolchain is available. Semantics are pinned to the Python decoder by
 * tests/test_data.py (random streams + libtiff-written files).
 *
 * Returns: bytes written to dst; -1 on a corrupt stream; -2 when dst is
 * too small (caller regrows and retries). A stream that ends without an
 * EOI code returns what was decoded (tolerates truncated strips).
 */

#define LZW_CLEAR 256
#define LZW_EOI 257
#define LZW_FIRST 258
#define LZW_TABLE 4096

static int first_char(int code, const unsigned short *prefix) {
    while (code >= LZW_FIRST)
        code = prefix[code];
    return code; /* < 256 */
}

long svrs_lzw_decode(const unsigned char *src, long n, unsigned char *dst,
                     long cap) {
    unsigned short prefix[LZW_TABLE];
    unsigned char suffix[LZW_TABLE];
    unsigned char stack[LZW_TABLE];
    int width = 9, next = LZW_FIRST, old = -1;
    long pos = 0, out = 0;
    unsigned long bitbuf = 0;
    int nbits = 0;

    for (;;) {
        while (nbits < width) {
            if (pos >= n)
                return out; /* missing EOI: tolerate truncated strip */
            bitbuf = (bitbuf << 8) | src[pos++];
            nbits += 8;
        }
        int code = (int)((bitbuf >> (nbits - width)) & ((1UL << width) - 1));
        nbits -= width;

        if (code == LZW_EOI)
            return out;
        if (code == LZW_CLEAR) {
            width = 9;
            next = LZW_FIRST;
            old = -1;
            continue;
        }
        int added = 0;
        if (code == next) { /* KwKwK: entry is old-string + first(old) */
            if (old < 0)
                return -1;
            if (next < LZW_TABLE) {
                prefix[next] = (unsigned short)old;
                suffix[next] = (unsigned char)first_char(old, prefix);
                next++;
                added = 1;
            } else {
                return -1; /* encoder must have cleared by now */
            }
        } else if (code > next) {
            /* CLEAR/EOI were consumed above, so any non-table code here
             * means a corrupt stream */
            return -1;
        }

        /* emit string(code) via the reversal stack */
        int sp = 0, c = code;
        while (c >= LZW_FIRST) {
            if (sp >= LZW_TABLE)
                return -1;
            stack[sp++] = suffix[c];
            c = prefix[c];
        }
        stack[sp++] = (unsigned char)c;
        if (out + sp > cap)
            return -2;
        while (sp > 0)
            dst[out++] = stack[--sp];

        if (!added && old >= 0 && next < LZW_TABLE) {
            prefix[next] = (unsigned short)old;
            suffix[next] = (unsigned char)first_char(code, prefix);
            next++;
            added = 1;
        }
        /* early change: grow the width when the table reaches 511/1023/
         * 2047 entries (matches the Python decoder and libtiff) */
        if (added && next + 1 >= (1 << width) && width < 12)
            width++;
        old = code;
    }
}
