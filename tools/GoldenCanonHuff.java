import org.gridfour.compress.canonicalHuffman.CanonicalHuffman;
import org.gridfour.compress.canonicalHuffman.CodecCanonHuffman;
import org.gridfour.io.BitOutputStore;
import org.gridfour.lsop.LsEncoder12;
import java.util.Random;

// Golden vectors for the reference-format canonical Huffman codec paths the
// engine must decode (round-4 verdict missing #1):
//   kind=canon : one CanonicalHuffman.encode() block over an int[] stream
//   kind=canon2: TWO blocks back to back in one BitOutputStore (the LSOP shape)
//   kind=tile  : CodecCanonHuffman.encode() standalone GVRS tile packing
//   kind=lsop  : LsEncoder12 with deflate disabled -> COMPRESSION_TYPE_CANON_HUFFMAN
// Output per case (self-contained; no RNG reproduction needed downstream):
//   case <name> <kind> <nr> <nc>
//   input <comma-separated ints>
//   packing <hex|null>
public class GoldenCanonHuff {

  static void emit(String name, String kind, int nr, int nc, int[] values, byte[] packing) {
    System.out.println("case " + name + " " + kind + " " + nr + " " + nc);
    StringBuilder sb = new StringBuilder("input ");
    for (int i = 0; i < values.length; i++) {
      if (i > 0) sb.append(',');
      sb.append(values[i]);
    }
    System.out.println(sb);
    if (packing == null) {
      System.out.println("packing null");
    } else {
      StringBuilder hx = new StringBuilder("packing ");
      for (byte b : packing) hx.append(String.format("%02x", b));
      System.out.println(hx);
    }
  }

  static void canon(String name, int[] values) {
    CanonicalHuffman h = new CanonicalHuffman();
    byte[] packing = h.encode(values.length, 0, values);
    emit(name, "canon", 1, values.length, packing == null ? values : values, packing);
  }

  static void canon2(String name, int[] a, int[] b) {
    // two blocks in one store, like LsEncoder12.encode:148-153
    CanonicalHuffman h = new CanonicalHuffman();
    BitOutputStore store = new BitOutputStore();
    h.encode(store, a.length, 0, a);
    h.encode(store, b.length, 0, b);
    int[] joined = new int[a.length + b.length + 1];
    joined[0] = a.length; // first slot carries the split point
    System.arraycopy(a, 0, joined, 1, a.length);
    System.arraycopy(b, 0, joined, 1 + a.length, b.length);
    emit(name, "canon2", 1, joined.length, joined, store.getEncodedText());
  }

  static void tile(String name, int nr, int nc, int[] values) {
    CodecCanonHuffman codec = new CodecCanonHuffman();
    byte[] packing = codec.encode(3, nr, nc, values);
    emit(name, "tile", nr, nc, values, packing);
  }

  static void lsop(String name, int nr, int nc, int[] values) {
    LsEncoder12 enc = new LsEncoder12();
    enc.setDeflateEnabled(false); // force COMPRESSION_TYPE_CANON_HUFFMAN
    byte[] packing = enc.encode(4, nr, nc, values);
    emit(name, "lsop", nr, nc, values, packing);
  }

  static final int NULL4 = Integer.MIN_VALUE;

  public static void main(String[] args) {
    Random r = new Random(20260817);

    // --- raw canonical blocks ---
    canon("zeros", new int[1000]);
    canon("single", new int[]{7});
    int[] small = new int[4000];
    for (int i = 0; i < small.length; i++) small[i] = r.nextInt(21) - 10;
    canon("smallmix", small);
    // every escape tier: 2-bit, 2x2-bit, 3x2-bit, 1-byte, 2-byte, 3-byte, null
    int[] esc = new int[]{
      0, 1, -1, 127, -128, 200, -200, 511, -512, 1500, -1500, 2047, -2048,
      5000, -5000, 8191, -8192, 20000, -20000, 32767, -32768, 1000000,
      -1000000, 8388607, -8388608, 100000000, -100000000, 2147483647,
      -2147483647, NULL4, 0, 3, NULL4, -7
    };
    canon("escapes", esc);
    int[] geo = new int[6000];
    for (int i = 0; i < geo.length; i++) {
      double u = r.nextDouble();
      int mag = (int) Math.floor(-Math.log(1 - u) / 0.08);
      geo[i] = r.nextBoolean() ? mag : -mag;
    }
    canon("geometric", geo);
    int[] sparse = new int[500];
    sparse[200] = 42; sparse[499] = -9000;   // long zero runs in the length table
    canon("manyzeros", sparse);

    // --- two blocks in one store (the LSOP stream shape) ---
    int[] b2 = new int[700];
    for (int i = 0; i < b2.length; i++) b2[i] = r.nextInt(9) - 4;
    canon2("pair", esc, b2);

    // --- standalone GVRS tiles ---
    int[] uni = new int[20 * 24];
    java.util.Arrays.fill(uni, -773);
    tile("uniform", 20, 24, uni);

    int[] ramp = new int[20 * 24];
    for (int i = 0; i < 20; i++)
      for (int j = 0; j < 24; j++) ramp[i * 24 + j] = 3 * i + 2 * j - 40;
    tile("ramp", 20, 24, ramp);

    int[] noisy = new int[20 * 24];
    for (int i = 0; i < 20; i++)
      for (int j = 0; j < 24; j++) noisy[i * 24 + j] = 5 * i - 3 * j + r.nextInt(15) - 7;
    tile("noisy", 20, 24, noisy);

    int[] nulls = new int[20 * 24];
    for (int i = 0; i < 20; i++)
      for (int j = 0; j < 24; j++)
        nulls[i * 24 + j] = (r.nextInt(5) == 0) ? NULL4 : (2 * i + j + r.nextInt(5));
    tile("withnulls", 20, 24, nulls);

    int[] big = new int[120 * 120];
    for (int i = 0; i < 120; i++)
      for (int j = 0; j < 120; j++)
        big[i * 120 + j] = (int) Math.round(
          1200 * Math.sin(i * 0.05) * Math.cos(j * 0.04) + 40 * Math.sin(i * 0.3)
          + r.nextInt(7) - 3);
    tile("big", 120, 120, big);

    int[] wild = new int[20 * 24];
    for (int i = 0; i < wild.length; i++) wild[i] = r.nextInt(2000000) - 1000000;
    tile("wild", 20, 24, wild);

    // --- LSOP packings with canonical-Huffman residuals ---
    int[] s60 = new int[60 * 60];
    for (int i = 0; i < 60; i++)
      for (int j = 0; j < 60; j++)
        s60[i * 60 + j] = (int) Math.round(
          800 * Math.sin(i * 0.07) * Math.cos(j * 0.06) + 0.5 * i * j / 10.0);
    lsop("smooth60", 60, 60, s60);

    int[] s120 = new int[120 * 120];
    for (int i = 0; i < 120; i++)
      for (int j = 0; j < 120; j++)
        s120[i * 120 + j] = (int) Math.round(
          1500 * Math.sin(i * 0.04 + 0.3) * Math.cos(j * 0.05)
          + 25 * Math.sin(j * 0.21) + r.nextInt(5) - 2);
    lsop("smooth120", 120, 120, s120);
  }
}
