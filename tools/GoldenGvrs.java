import java.io.File;
import java.util.List;
import org.gridfour.gvrs.GvrsElement;
import org.gridfour.gvrs.GvrsElementType;
import org.gridfour.gvrs.GvrsFile;

// Dumps every cell of every sample .gvrs file through the reference reader.
// Output (one file): "FILE <name> <nRows> <nCols> <nElements>" then per
// element "ELEM <name> <type>" followed by nRows lines of values —
// ints printed raw, floats printed as Float.floatToRawIntBits hex so the
// comparison in tests/test_gvrsfile.py is bit-exact.
public class GoldenGvrs {
  public static void main(String[] args) throws Exception {
    for (String path : args) {
      File f = new File(path);
      try (GvrsFile g = new GvrsFile(f, "r")) {
        int nRows = g.getSpecification().getRowsInGrid();
        int nCols = g.getSpecification().getColumnsInGrid();
        List<GvrsElement> elements = g.getElements();
        System.out.println("FILE " + f.getName() + " " + nRows + " " + nCols + " " + elements.size());
        for (GvrsElement e : elements) {
          GvrsElementType t = e.getDataType();
          boolean isFloat = t == GvrsElementType.FLOAT || t == GvrsElementType.INT_CODED_FLOAT;
          System.out.println("ELEM " + e.getName() + " " + (isFloat ? "f" : "i"));
          StringBuilder sb = new StringBuilder();
          for (int r = 0; r < nRows; r++) {
            sb.setLength(0);
            for (int c = 0; c < nCols; c++) {
              if (c > 0) sb.append(' ');
              if (isFloat) {
                float v = e.readValue(r, c);
                sb.append(Integer.toHexString(Float.floatToRawIntBits(v)));
              } else {
                sb.append(e.readValueInt(r, c));
              }
            }
            System.out.println(sb);
          }
        }
      }
    }
  }
}
