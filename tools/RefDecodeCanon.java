import java.io.BufferedReader;
import java.io.InputStreamReader;
import org.gridfour.compress.canonicalHuffman.CanonicalHuffman;
import org.gridfour.compress.canonicalHuffman.CodecCanonHuffman;
import org.gridfour.io.BitInputStore;
import org.gridfour.lsop.LsDecoder12;

// Decodes engine-written canonical-Huffman packings with the UNMODIFIED
// reference decoder — the write-direction interop proof. Reads lines from
// stdin:  "canon <nSymbols> <hex>" | "tile <nr> <nc> <hex>" |
//         "lsop <nr> <nc> <hex>"  (LSOP-12, incl. canonical residuals)
// and prints one line of comma-separated ints per input line.
public class RefDecodeCanon {
  static byte[] unhex(String s) {
    byte[] b = new byte[s.length() / 2];
    for (int i = 0; i < b.length; i++)
      b[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
    return b;
  }

  static void print(int[] v, int n) {
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < n; i++) {
      if (i > 0) sb.append(',');
      sb.append(v[i]);
    }
    System.out.println(sb);
  }

  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
    String line;
    while ((line = in.readLine()) != null) {
      String[] t = line.trim().split(" ");
      if (t[0].equals("canon")) {
        int n = Integer.parseInt(t[1]);
        byte[] packing = unhex(t[2]);
        int[] out = new int[n];
        CanonicalHuffman h = new CanonicalHuffman();
        h.decode(new BitInputStore(packing, 0, packing.length), n, out);
        print(out, n);
      } else if (t[0].equals("tile")) {
        int nr = Integer.parseInt(t[1]);
        int nc = Integer.parseInt(t[2]);
        byte[] packing = unhex(t[3]);
        CodecCanonHuffman codec = new CodecCanonHuffman();
        int[] out = codec.decode(nr, nc, packing);
        print(out, nr * nc);
      } else if (t[0].equals("lsop")) {
        int nr = Integer.parseInt(t[1]);
        int nc = Integer.parseInt(t[2]);
        byte[] packing = unhex(t[3]);
        LsDecoder12 dec = new LsDecoder12();
        int[] out = dec.decode(nr, nc, packing);
        print(out, nr * nc);
      }
    }
  }
}
