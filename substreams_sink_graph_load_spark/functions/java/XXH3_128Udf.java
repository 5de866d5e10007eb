package sparkgraft;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;

import org.apache.spark.sql.api.java.UDF2;

/**
 * JVM-side XXH3-128 with seed — the production hash path the pure-Python
 * port (stablehash/xxh3.py) documents.  Implementation of the
 * public-domain XXH3 algorithm (Yann Collet's xxHash, BSD 2-clause; the
 * algorithm spec is public); only the 128-bit seeded one-shot variant,
 * matching the reference hasher (ref stablehash/fast_hasher.go:81-95).
 *
 * Registered from Python via functions/jvm_xxh3.py (runtime javac+jar,
 * gated on a JDK being present) as
 *   xxh3_128_seed(data BINARY, seed BIGINT) -> BINARY(16)
 * returning the canonical big-endian digest (high64 || low64).  The
 * differential test (tests/test_jvm_xxh3.py) pins it bit-for-bit against
 * the golden-anchored Python port across every length class and random
 * seeds, so a porting slip cannot ship silently.
 *
 * All arithmetic is mod 2^64, which Java long arithmetic gives for free;
 * unsigned right shifts are {@code >>>}; the unsigned 128-bit multiply
 * high half corrects {@link Math#multiplyHigh} (signed) with the
 * standard two-term adjustment.
 */
public final class XXH3_128Udf implements UDF2<byte[], Long, byte[]> {

    private static final long P32_1 = 0x9E3779B1L;
    private static final long P32_2 = 0x85EBCA77L;
    private static final long P32_3 = 0xC2B2AE3DL;
    private static final long P64_1 = 0x9E3779B185EBCA87L;
    private static final long P64_2 = 0xC2B2AE3D27D4EB4FL;
    private static final long P64_3 = 0x165667B19E3779F9L;
    private static final long P64_4 = 0x85EBCA77C2B2AE63L;
    private static final long P64_5 = 0x27D4EB2F165667C5L;

    private static final byte[] K_SECRET = hexToBytes(
        "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
        + "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
        + "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
        + "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
        + "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
        + "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e");

    private static final int STRIPE_LEN = 64;
    private static final int ACC_NB = 8;
    private static final int SECRET_CONSUME_RATE = 8;
    private static final int SECRET_LASTACC_START = 7;
    private static final int SECRET_MERGEACCS_START = 11;
    private static final int MIDSIZE_STARTOFFSET = 3;
    private static final int MIDSIZE_LASTOFFSET = 17;
    private static final int SECRET_SIZE_MIN = 136;

    @Override
    public byte[] call(byte[] data, Long seed) {
        if (data == null) {
            return null;
        }
        long[] d = hash128(data, seed == null ? 0L : seed);
        ByteBuffer out = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN);
        out.putLong(d[1]).putLong(d[0]); // canonical: high64 || low64
        return out.array();
    }

    /** Returns {low64, high64} of XXH3-128(data, seed). */
    public static long[] hash128(byte[] d, long seed) {
        int n = d.length;
        if (n <= 16) {
            if (n > 8) return len9to16(d, n, seed);
            if (n >= 4) return len4to8(d, n, seed);
            if (n > 0) return len1to3(d, n, seed);
            return len0(seed);
        }
        if (n <= 128) return len17to128(d, n, seed);
        if (n <= 240) return len129to240(d, n, seed);
        return hashLong(d, n, seed);
    }

    // --- primitives --------------------------------------------------------

    private static byte[] hexToBytes(String hex) {
        byte[] out = new byte[hex.length() / 2];
        for (int i = 0; i < out.length; i++) {
            out[i] = (byte) Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16);
        }
        return out;
    }

    private static long r64(byte[] b, int off) {
        long v = 0;
        for (int i = 7; i >= 0; i--) {
            v = (v << 8) | (b[off + i] & 0xFFL);
        }
        return v;
    }

    private static long r32(byte[] b, int off) {
        long v = 0;
        for (int i = 3; i >= 0; i--) {
            v = (v << 8) | (b[off + i] & 0xFFL);
        }
        return v;
    }

    private static long unsignedMulHigh(long a, long b) {
        return Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a);
    }

    private static long mul128Fold64(long a, long b) {
        return (a * b) ^ unsignedMulHigh(a, b);
    }

    private static long xxh3Avalanche(long h) {
        h ^= h >>> 37;
        h *= 0x165667919E3779F9L;
        return h ^ (h >>> 32);
    }

    private static long xxh64Avalanche(long h) {
        h ^= h >>> 33;
        h *= P64_2;
        h ^= h >>> 29;
        h *= P64_3;
        h ^= h >>> 32;
        return h;
    }

    private static long mix16b(byte[] in, int off, byte[] s, int soff, long seed) {
        return mul128Fold64(
            r64(in, off) ^ (r64(s, soff) + seed),
            r64(in, off + 8) ^ (r64(s, soff + 8) - seed));
    }

    // acc is {lo, hi}, mutated in place
    private static void mix32b(long[] acc, byte[] in, int off1, int off2,
                               byte[] s, int soff, long seed) {
        acc[0] += mix16b(in, off1, s, soff, seed);
        acc[0] ^= r64(in, off2) + r64(in, off2 + 8);
        acc[1] += mix16b(in, off2, s, soff + 16, seed);
        acc[1] ^= r64(in, off1) + r64(in, off1 + 8);
    }

    // --- length classes ----------------------------------------------------

    private static long[] len0(long seed) {
        byte[] s = K_SECRET;
        long lo = xxh64Avalanche(seed ^ r64(s, 64) ^ r64(s, 72));
        long hi = xxh64Avalanche(seed ^ r64(s, 80) ^ r64(s, 88));
        return new long[] {lo, hi};
    }

    private static long[] len1to3(byte[] d, int n, long seed) {
        byte[] s = K_SECRET;
        int c1 = d[0] & 0xFF;
        int c2 = d[n >>> 1] & 0xFF;
        int c3 = d[n - 1] & 0xFF;
        int combinedL = (c1 << 16) | (c2 << 24) | c3 | (n << 8);
        int combinedH = Integer.rotateLeft(Integer.reverseBytes(combinedL), 13);
        long bitflipL = (r32(s, 0) ^ r32(s, 4)) + seed;
        long bitflipH = (r32(s, 8) ^ r32(s, 12)) - seed;
        long lo = xxh64Avalanche((combinedL & 0xFFFFFFFFL) ^ bitflipL);
        long hi = xxh64Avalanche((combinedH & 0xFFFFFFFFL) ^ bitflipH);
        return new long[] {lo, hi};
    }

    private static long[] len4to8(byte[] d, int n, long seed) {
        byte[] s = K_SECRET;
        seed ^= ((long) Integer.reverseBytes((int) seed)) << 32;
        long inputLo = r32(d, 0);
        long inputHi = r32(d, n - 4);
        long input64 = inputLo + (inputHi << 32);
        long bitflip = (r64(s, 16) ^ r64(s, 24)) + seed;
        long keyed = input64 ^ bitflip;
        long mult = P64_1 + ((long) n << 2);
        long mLo = keyed * mult;
        long mHi = unsignedMulHigh(keyed, mult);
        mHi += mLo << 1;
        mLo ^= mHi >>> 3;
        mLo ^= mLo >>> 35;
        mLo *= 0x9FB21C651E98DF25L;
        mLo ^= mLo >>> 28;
        mHi = xxh3Avalanche(mHi);
        return new long[] {mLo, mHi};
    }

    private static long[] len9to16(byte[] d, int n, long seed) {
        byte[] s = K_SECRET;
        long bitflipL = (r64(s, 32) ^ r64(s, 40)) - seed;
        long bitflipH = (r64(s, 48) ^ r64(s, 56)) + seed;
        long inputLo = r64(d, 0);
        long inputHi = r64(d, n - 8);
        long a = inputLo ^ inputHi ^ bitflipL;
        long mLo = a * P64_1;
        long mHi = unsignedMulHigh(a, P64_1);
        mLo += (long) (n - 1) << 54;
        inputHi ^= bitflipH;
        mHi += inputHi + (inputHi & 0xFFFFFFFFL) * (P32_2 - 1);
        mLo ^= Long.reverseBytes(mHi);
        long hLo = mLo * P64_2;
        long hHi = unsignedMulHigh(mLo, P64_2) + mHi * P64_2;
        return new long[] {xxh3Avalanche(hLo), xxh3Avalanche(hHi)};
    }

    private static long[] len17to128(byte[] d, int n, long seed) {
        byte[] s = K_SECRET;
        long[] acc = {n * P64_1, 0L};
        if (n > 32) {
            if (n > 64) {
                if (n > 96) {
                    mix32b(acc, d, 48, n - 64, s, 96, seed);
                }
                mix32b(acc, d, 32, n - 48, s, 64, seed);
            }
            mix32b(acc, d, 16, n - 32, s, 32, seed);
        }
        mix32b(acc, d, 0, n - 16, s, 0, seed);
        return finalMerge(acc[0], acc[1], n, seed);
    }

    private static long[] len129to240(byte[] d, int n, long seed) {
        byte[] s = K_SECRET;
        int nbRounds = n / 32;
        long[] acc = {n * P64_1, 0L};
        for (int i = 0; i < 4; i++) {
            mix32b(acc, d, 32 * i, 32 * i + 16, s, 32 * i, seed);
        }
        acc[0] = xxh3Avalanche(acc[0]);
        acc[1] = xxh3Avalanche(acc[1]);
        for (int i = 4; i < nbRounds; i++) {
            mix32b(acc, d, 32 * i, 32 * i + 16,
                   s, MIDSIZE_STARTOFFSET + 32 * (i - 4), seed);
        }
        mix32b(acc, d, n - 16, n - 32,
               s, SECRET_SIZE_MIN - MIDSIZE_LASTOFFSET - 16, -seed);
        return finalMerge(acc[0], acc[1], n, seed);
    }

    private static long[] finalMerge(long accLo, long accHi, int n, long seed) {
        long hLo = accLo + accHi;
        long hHi = accLo * P64_1 + accHi * P64_4 + (n - seed) * P64_2;
        return new long[] {xxh3Avalanche(hLo), -xxh3Avalanche(hHi)};
    }

    // --- long input path (> 240 bytes) -------------------------------------

    private static byte[] customSecret(long seed) {
        if (seed == 0) {
            return K_SECRET;
        }
        byte[] out = new byte[192];
        ByteBuffer bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN);
        for (int i = 0; i < 192; i += 16) {
            bb.putLong(i, r64(K_SECRET, i) + seed);
            bb.putLong(i + 8, r64(K_SECRET, i + 8) - seed);
        }
        return out;
    }

    private static void accumulate512(long[] acc, byte[] d, int doff,
                                      byte[] s, int soff) {
        for (int i = 0; i < ACC_NB; i++) {
            long dataVal = r64(d, doff + 8 * i);
            long dataKey = dataVal ^ r64(s, soff + 8 * i);
            acc[i ^ 1] += dataVal;
            acc[i] += (dataKey & 0xFFFFFFFFL) * (dataKey >>> 32);
        }
    }

    private static void scramble(long[] acc, byte[] s, int soff) {
        for (int i = 0; i < ACC_NB; i++) {
            long a = acc[i];
            a ^= a >>> 47;
            a ^= r64(s, soff + 8 * i);
            acc[i] = a * P32_1;
        }
    }

    private static long mergeAccs(long[] acc, byte[] s, int soff, long start) {
        long result = start;
        for (int i = 0; i < 4; i++) {
            result += mul128Fold64(
                acc[2 * i] ^ r64(s, soff + 16 * i),
                acc[2 * i + 1] ^ r64(s, soff + 16 * i + 8));
        }
        return xxh3Avalanche(result);
    }

    private static long[] hashLong(byte[] d, int n, long seed) {
        byte[] s = customSecret(seed);
        long[] acc = {P32_3, P64_1, P64_2, P64_3, P64_4, P64_5, P32_2, P32_1};
        int nbStripesPerBlock = (s.length - STRIPE_LEN) / SECRET_CONSUME_RATE;
        int blockLen = STRIPE_LEN * nbStripesPerBlock;
        int nbBlocks = (n - 1) / blockLen;

        for (int b = 0; b < nbBlocks; b++) {
            for (int i = 0; i < nbStripesPerBlock; i++) {
                accumulate512(acc, d, b * blockLen + i * STRIPE_LEN,
                              s, i * SECRET_CONSUME_RATE);
            }
            scramble(acc, s, s.length - STRIPE_LEN);
        }

        int nbStripes = ((n - 1) - blockLen * nbBlocks) / STRIPE_LEN;
        for (int i = 0; i < nbStripes; i++) {
            accumulate512(acc, d, nbBlocks * blockLen + i * STRIPE_LEN,
                          s, i * SECRET_CONSUME_RATE);
        }
        accumulate512(acc, d, n - STRIPE_LEN,
                      s, s.length - STRIPE_LEN - SECRET_LASTACC_START);

        long lo = mergeAccs(acc, s, SECRET_MERGEACCS_START, n * P64_1);
        long hi = mergeAccs(acc, s,
                            s.length - ACC_NB * 8 - SECRET_MERGEACCS_START,
                            ~(n * P64_2));
        return new long[] {lo, hi};
    }
}
