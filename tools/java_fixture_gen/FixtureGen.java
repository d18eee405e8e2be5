// Runs the reference stl-decomp-4j library on gap-filled series to produce
// independent expected outputs for the engine's STL-family driver queries.
// Input (arg 0): text file of blocks
//     SERIES <url> <n>
//     <value> <weekend> <daily_sine>     x n lines (17-sig-digit decimals)
// Output (arg 1): lines, all doubles at %.17e (round-trippable float64):
//     RES <tag> <url> <i> <trend> <seasonal> <residual> <weight>
//         tag in {std, per, rper, exog}
//     STATS <url> <dataMean> <dataVar> <trendRange> <seasVar> <residVar>
//           <trendZ> <seasZ>
//     SMOOTH <url> <i> <seasonalSmoothed> <residual>
// Configs mirror the engine's driver queries (period 24, seasonal width 35,
// non-robust ni=2/no=0; periodic diagnostics; smoothSeasonal(15); exogenous
// weekend+daily regressors).
import java.io.BufferedReader;
import java.io.BufferedWriter;
import java.io.FileReader;
import java.io.FileWriter;
import java.io.PrintWriter;
import java.util.Locale;

import com.github.servicenow.ds.stats.stl.SeasonalTrendLoess;
import com.github.servicenow.ds.stats.stl.StlFitStats;

public class FixtureGen {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new FileReader(args[0]));
        PrintWriter out = new PrintWriter(new BufferedWriter(new FileWriter(args[1])));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.trim().isEmpty()) continue;
            String[] h = line.trim().split("\\s+");
            String url = h[1];
            int n = Integer.parseInt(h[2]);
            double[] y = new double[n];
            double[] wk = new double[n];
            double[] dl = new double[n];
            for (int i = 0; i < n; i++) {
                String[] p = in.readLine().trim().split("\\s+");
                y[i] = Double.parseDouble(p[0]);
                wk[i] = Double.parseDouble(p[1]);
                dl[i] = Double.parseDouble(p[2]);
            }
            SeasonalTrendLoess.Decomposition d = new SeasonalTrendLoess.Builder()
                    .setPeriodLength(24).setSeasonalWidth(35).buildSmoother(y).decompose();
            dump(out, "std", url, d);
            StlFitStats s = new StlFitStats(d);
            out.printf(Locale.ROOT, "STATS %s %.17e %.17e %.17e %.17e %.17e %.17e %.17e%n", url,
                    s.getDataMean(), s.getDataVariance(), s.getTrendRange(), s.getSeasonalVariance(),
                    s.getResidualVariance(), s.getTrendinessZScore(), s.getSeasonalZScore());
            d.smoothSeasonal(15);
            double[] ss = d.getSeasonal();
            double[] rr = d.getResidual();
            for (int i = 0; i < n; i++) {
                out.printf(Locale.ROOT, "SMOOTH %s %d %.17e %.17e%n", url, i, ss[i], rr[i]);
            }
            dump(out, "per", url, SeasonalTrendLoess.performPeriodicDecomposition(y, 24));
            dump(out, "rper", url, SeasonalTrendLoess.performRobustPeriodicDecomposition(y, 24));
            double[][] exog = new double[][]{wk, dl};
            SeasonalTrendLoess.Decomposition de = new SeasonalTrendLoess.Builder()
                    .setPeriodLength(24).setSeasonalWidth(35)
                    .setInnerIterations(2).setRobustnessIterations(0)
                    .buildSmoother(y, exog).decompose();
            dump(out, "exog", url, de);
        }
        out.close();
    }

    static void dump(PrintWriter out, String tag, String url, SeasonalTrendLoess.Decomposition d) {
        double[] t = d.getTrend();
        double[] s = d.getSeasonal();
        double[] r = d.getResidual();
        double[] w = d.getWeights();
        for (int i = 0; i < t.length; i++) {
            out.printf(Locale.ROOT, "RES %s %s %d %.17e %.17e %.17e %.17e%n", tag, url, i, t[i], s[i], r[i], w[i]);
        }
    }
}
