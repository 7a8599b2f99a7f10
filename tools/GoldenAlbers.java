// Golden-vector generator: drives the UNMODIFIED reference
// demo/geoTiff/AlbersEqualAreaConic.java forward() and prints
// lat\tlon\tx\ty lines. Lives in the same package because the reference
// class is package-private. Probe points come from the java.util.Random
// LCG recurrence so the Python test regenerates them bit-identically.
package org.gridfour.demo.geoTiff;

public class GoldenAlbers {

    public static void main(String[] args) {
        double lat0 = Double.parseDouble(args[0]);
        double lon0 = Double.parseDouble(args[1]);
        double sp1 = Double.parseDouble(args[2]);
        double sp2 = Double.parseDouble(args[3]);
        int n = args.length > 4 ? Integer.parseInt(args[4]) : 200;
        AlbersEqualAreaConic p = new AlbersEqualAreaConic(lat0, lon0, sp1, sp2);
        double[] src = new double[2];
        double[] dst = new double[2];
        long s = 123456789L;
        long mask = (1L << 48) - 1;
        for (int i = 0; i < n; i++) {
            s = (s * 25214903917L + 11L) & mask;
            double lat = ((double) (s >>> 16) / 4294967296.0) * 170.0 - 85.0;
            s = (s * 25214903917L + 11L) & mask;
            double lon = ((double) (s >>> 16) / 4294967296.0) * 360.0 - 180.0;
            src[0] = lat;
            src[1] = lon;
            p.forward(src, 0, dst, 0, 1);
            System.out.println(lat + "\t" + lon + "\t" + dst[0] + "\t" + dst[1]);
        }
    }
}
