import org.gridfour.compress.HuffmanEncoder;
import org.gridfour.io.BitOutputStore;
import java.util.Random;

// Emits hex golden vectors: for each test case, one line "name nBits hex"
public class GoldenHuff {
  static void emit(String name, byte[] symbols) {
    HuffmanEncoder enc = new HuffmanEncoder();
    BitOutputStore store = new BitOutputStore();
    enc.encode(store, symbols.length, symbols);
    byte[] text = store.getEncodedText();
    StringBuilder sb = new StringBuilder();
    for (byte b : text) sb.append(String.format("%02x", b));
    System.out.println(name + " " + store.getEncodedTextLength() + " " + sb);
  }
  public static void main(String[] args) {
    emit("single", new byte[500]);  // all zeros
    byte[] two = new byte[10]; for (int i = 0; i < 10; i++) two[i] = (byte)(i % 2);
    emit("two", two);
    byte[] uni = new byte[1024]; for (int i = 0; i < 1024; i++) uni[i] = (byte)(i % 256);
    emit("uniform", uni);
    Random r = new Random(42);
    byte[] geo = new byte[4000];
    for (int i = 0; i < 4000; i++) {
      double u = r.nextDouble();
      int v = (int) Math.floor(-Math.log(1 - u) / 0.25);
      geo[i] = (byte) Math.min(v, 255);
    }
    emit("geometric", geo);
    byte[] fib = new byte[1 + 1 + 2 + 3 + 5 + 8 + 13 + 21 + 34 + 55];
    int k = 0;
    int[] counts = {1, 1, 2, 3, 5, 8, 13, 21, 34, 55};
    for (int s = 0; s < counts.length; s++) for (int j = 0; j < counts[s]; j++) fib[k++] = (byte) s;
    emit("fibonacci", fib);
    byte[] mixed = new byte[2048];
    for (int i = 0; i < 2048; i++) mixed[i] = (byte) (r.nextInt(256) < 200 ? r.nextInt(4) : r.nextInt(256));
    emit("mixed", mixed);
  }
}
