package graftcov;

import java.io.BufferedWriter;
import java.io.FileWriter;
import java.io.Writer;
import java.nio.file.Files;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;
import java.util.TreeSet;
import java.util.stream.Stream;

import org.apache.xbean.asm9.ClassReader;
import org.apache.xbean.asm9.ClassVisitor;
import org.apache.xbean.asm9.Label;
import org.apache.xbean.asm9.MethodVisitor;
import org.apache.xbean.asm9.Opcodes;

/**
 * Static universe scan: the runtime agent only sees classes that LOAD, so
 * a coverage denominator built from its dumps alone overstates coverage
 * (never-loaded classes vanish). This tool walks the compiled classes
 * directory and emits the same TSV with all-zero hits/counts for EVERY
 * graft class — report.py unions it with the runtime dumps, so unloaded
 * classes count as 0% covered rather than not existing.
 *
 * Usage: java -cp <agent jar> graftcov.UniverseScan <classesDir> <outTsv>
 */
public final class UniverseScan {

  public static void main(String[] argv) throws Exception {
    Path root = Path.of(argv[0]);
    List<String> rows = new ArrayList<>();
    try (Stream<Path> files = Files.walk(root)) {
      files.filter(p -> p.toString().endsWith(".class")).sorted().forEach(p -> {
        String cls = root.relativize(p).toString()
            .replaceAll("\\.class$", "");
        if (!(cls.startsWith("graft/") || cls.startsWith("org/apache/spark/sql/graft/"))
            || cls.startsWith("graft/tools/")) return;
        try {
          scan(cls, Files.readAllBytes(p), rows);
        } catch (Exception e) {
          System.err.println("[graftcov] universe skip " + cls + ": " + e);
        }
      });
    }
    try (Writer w = new BufferedWriter(new FileWriter(argv[1]))) {
      for (String r : rows) { w.write(r); w.write('\n'); }
    }
    System.err.println("[graftcov] universe: " + rows.size() + " rows -> " + argv[1]);
  }

  private static void scan(String cls, byte[] bytes, List<String> rows) {
    ClassReader cr = new ClassReader(bytes);
    final TreeSet<Integer> lines = new TreeSet<>();
    final List<int[]> sites = new ArrayList<>(); // {line, isSwitch}
    final String[] source = {null};
    cr.accept(new ClassVisitor(Opcodes.ASM9) {
      @Override public void visitSource(String s, String debug) { source[0] = s; }
      @Override public MethodVisitor visitMethod(int acc, String n, String d,
          String sig, String[] ex) {
        return new MethodVisitor(Opcodes.ASM9) {
          private int curLine = -1;
          @Override public void visitLineNumber(int line, Label start) {
            lines.add(line); curLine = line;
          }
          @Override public void visitJumpInsn(int opcode, Label label) {
            if (opcode != Opcodes.GOTO && opcode != Opcodes.JSR)
              sites.add(new int[]{curLine, 0});
          }
          @Override public void visitTableSwitchInsn(int min, int max, Label dflt, Label... ls) {
            sites.add(new int[]{curLine, 1});
          }
          @Override public void visitLookupSwitchInsn(Label dflt, int[] keys, Label[] ls) {
            sites.add(new int[]{curLine, 1});
          }
        };
      }
    }, ClassReader.SKIP_FRAMES);
    String src = source[0] == null ? "<unknown>" : source[0];
    for (int line : lines) rows.add("L\t" + cls + "\t" + src + "\t" + line + "\t0");
    for (int[] s : sites) rows.add("B\t" + cls + "\t" + src + "\t" + s[0] + "\t0\t0\t" + s[1]);
  }
}
