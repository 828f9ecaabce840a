package graftcov;

import java.io.BufferedWriter;
import java.io.FileWriter;
import java.io.Writer;
import java.util.ArrayList;
import java.util.List;
import java.util.concurrent.atomic.AtomicLongArray;

/**
 * Runtime side of the graft coverage agent (see CoverageAgent). Loaded
 * from the agent jar, which the JVM appends to the system class path, so
 * probes injected into any classloader's classes resolve here.
 *
 * Line probes are benign-race boolean stores (coverage only needs
 * "ever hit"); branch-site probes are atomic counters because the
 * taken-edge inference compares two counts (site vs fallthrough).
 */
public final class CoverageRecorder {
  private CoverageRecorder() {}

  private static final Object LOCK = new Object();
  private static String[] classNames = new String[1024];
  private static String[] sourceFiles = new String[1024];
  private static boolean[][] lineHits = new boolean[1024][];
  private static int[][] lineUniverse = new int[1024][];
  private static AtomicLongArray[] branchCounts = new AtomicLongArray[1024];
  private static int[][] branchLines = new int[1024][];
  private static boolean[][] branchIsSwitch = new boolean[1024][];
  private static int nextId = 0;
  private static volatile boolean hookInstalled = false;

  /** Called by the agent at transform time; returns the class id probes use. */
  public static int register(String className, String sourceFile, int maxLine,
      int[] universe, int[] siteLines, boolean[] siteIsSwitch) {
    synchronized (LOCK) {
      if (!hookInstalled) {
        hookInstalled = true;
        Runtime.getRuntime().addShutdownHook(new Thread(CoverageRecorder::dump, "graftcov-dump"));
      }
      if (nextId == classNames.length) {
        int cap = nextId * 2;
        classNames = java.util.Arrays.copyOf(classNames, cap);
        sourceFiles = java.util.Arrays.copyOf(sourceFiles, cap);
        lineHits = java.util.Arrays.copyOf(lineHits, cap);
        lineUniverse = java.util.Arrays.copyOf(lineUniverse, cap);
        branchCounts = java.util.Arrays.copyOf(branchCounts, cap);
        branchLines = java.util.Arrays.copyOf(branchLines, cap);
        branchIsSwitch = java.util.Arrays.copyOf(branchIsSwitch, cap);
      }
      int id = nextId++;
      classNames[id] = className;
      sourceFiles[id] = sourceFile == null ? "<unknown>" : sourceFile;
      lineHits[id] = new boolean[maxLine + 2];
      lineUniverse[id] = universe;
      branchCounts[id] = new AtomicLongArray(siteLines.length * 2);
      branchLines[id] = siteLines;
      branchIsSwitch[id] = siteIsSwitch;
      return id;
    }
  }

  public static void hit(int classId, int line) {
    boolean[] h = lineHits[classId];
    if (line < h.length) h[line] = true;
  }

  /** Probe BEFORE a conditional jump / switch: the site executed. */
  public static void site(int classId, int idx) {
    branchCounts[classId].getAndIncrement(idx * 2);
  }

  /** Probe on the fallthrough path of a conditional jump. */
  public static void fall(int classId, int idx) {
    branchCounts[classId].getAndIncrement(idx * 2 + 1);
  }

  /** TSV dump, one file per JVM. Format:
   *  L className sourceFile line hit(0/1)
   *  B className sourceFile line siteCount fallCount isSwitch(0/1)  */
  private static void dump() {
    String dir = System.getenv().getOrDefault("GRAFT_COVERAGE_OUT", "target/coverage");
    try {
      java.io.File d = new java.io.File(dir);
      d.mkdirs();
      java.io.File out = new java.io.File(d,
          "coverage-" + ProcessHandle.current().pid() + ".tsv");
      List<String> rows = new ArrayList<>();
      synchronized (LOCK) {
        for (int id = 0; id < nextId; id++) {
          boolean[] h = lineHits[id];
          for (int line : lineUniverse[id]) {
            rows.add("L\t" + classNames[id] + "\t" + sourceFiles[id] + "\t" + line
                + "\t" + (line < h.length && h[line] ? 1 : 0));
          }
          AtomicLongArray bc = branchCounts[id];
          for (int s = 0; s < branchLines[id].length; s++) {
            rows.add("B\t" + classNames[id] + "\t" + sourceFiles[id] + "\t"
                + branchLines[id][s] + "\t" + bc.get(s * 2) + "\t" + bc.get(s * 2 + 1)
                + "\t" + (branchIsSwitch[id][s] ? 1 : 0));
          }
        }
      }
      try (Writer w = new BufferedWriter(new FileWriter(out))) {
        for (String r : rows) { w.write(r); w.write('\n'); }
      }
      System.err.println("[graftcov] wrote " + rows.size() + " rows to " + out);
    } catch (Throwable t) {
      System.err.println("[graftcov] dump failed: " + t);
    }
  }
}
