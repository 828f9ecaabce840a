package graftcov;

import java.lang.instrument.ClassFileTransformer;
import java.lang.instrument.Instrumentation;
import java.security.ProtectionDomain;
import java.util.ArrayList;
import java.util.List;
import java.util.TreeSet;

import org.apache.xbean.asm9.ClassReader;
import org.apache.xbean.asm9.ClassVisitor;
import org.apache.xbean.asm9.ClassWriter;
import org.apache.xbean.asm9.Label;
import org.apache.xbean.asm9.MethodVisitor;
import org.apache.xbean.asm9.Opcodes;

/**
 * Line + branch coverage java agent for the graft engine — built because
 * this sandbox is offline (no scoverage/jacoco artifacts resolvable); the
 * ASM it needs is the shaded copy Spark already ships
 * (xbean-asm9-shaded), bundled into the agent jar by build.sh.
 *
 * Instruments classes whose code source is a `.../classes` directory (sbt
 * main output) under the graft packages — test classes
 * (`.../test-classes`) and everything else load untouched.
 *
 * Probes (straight-line bytecode inserts only — no new jump targets, so
 * existing StackMapTable frames stay valid and only maxStack needs
 * recomputing):
 *  - after every LineNumber marker: CoverageRecorder.hit(classId, line)
 *  - before every conditional jump/switch: .site(classId, idx)
 *  - on every conditional jump's fallthrough path: .fall(classId, idx)
 *
 * Branch edges are then inferred exactly for two-way conditionals:
 * fallthrough edge taken iff fallCount > 0; jump edge taken iff
 * siteCount > fallCount (the probe pair brackets the jump, so every
 * not-taken execution increments both). Switches record site execution
 * only (per-case edges would need trampoline labels + frame
 * recomputation); the report counts a switch as one site with one edge.
 */
public final class CoverageAgent {

  public static void premain(String args, Instrumentation inst) {
    inst.addTransformer(new Transformer());
    System.err.println("[graftcov] agent installed");
  }

  static final class Transformer implements ClassFileTransformer {
    @Override
    public byte[] transform(ClassLoader loader, String className,
        Class<?> redefined, ProtectionDomain pd, byte[] bytes) {
      try {
        if (className == null || redefined != null) return null;
        if (!(className.startsWith("graft/")
            || className.startsWith("org/apache/spark/sql/graft/"))) return null;
        if (className.startsWith("graftcov/")) return null;
        if (pd == null || pd.getCodeSource() == null
            || pd.getCodeSource().getLocation() == null) return null;
        String loc = pd.getCodeSource().getLocation().toString();
        // main classes only. Two load shapes: `sbt test` forks with the
        // classes DIRECTORY on the classpath (test-classes rejected by
        // the suffix check); `sbt runMain` packages main classes into the
        // project jar under target/bg-jobs (main-only by construction).
        boolean mainDir = loc.endsWith("/classes/") || loc.endsWith("/classes");
        boolean projectJar = loc.endsWith(".jar") && loc.contains("vectorsearchspark");
        if (!mainDir && !projectJar) return null;
        return instrument(className, bytes);
      } catch (Throwable t) {
        System.err.println("[graftcov] skipping " + className + ": " + t);
        return null;
      }
    }
  }

  private static byte[] instrument(String className, byte[] bytes) {
    // ---- pass 1: collect the line universe and branch sites ----
    ClassReader cr1 = new ClassReader(bytes);
    final TreeSet<Integer> lines = new TreeSet<>();
    final List<Integer> siteLines = new ArrayList<>();
    final List<Boolean> siteSwitch = new ArrayList<>();
    final String[] source = {null};
    cr1.accept(new ClassVisitor(Opcodes.ASM9) {
      @Override public void visitSource(String s, String debug) { source[0] = s; }
      @Override public MethodVisitor visitMethod(int acc, String n, String d,
          String sig, String[] ex) {
        return new MethodVisitor(Opcodes.ASM9) {
          private int curLine = -1;
          @Override public void visitLineNumber(int line, Label start) {
            lines.add(line); curLine = line;
          }
          @Override public void visitJumpInsn(int opcode, Label label) {
            if (opcode != Opcodes.GOTO && opcode != Opcodes.JSR) {
              siteLines.add(curLine); siteSwitch.add(false);
            }
          }
          @Override public void visitTableSwitchInsn(int min, int max, Label dflt, Label... ls) {
            siteLines.add(curLine); siteSwitch.add(true);
          }
          @Override public void visitLookupSwitchInsn(Label dflt, int[] keys, Label[] ls) {
            siteLines.add(curLine); siteSwitch.add(true);
          }
        };
      }
    }, ClassReader.SKIP_FRAMES);

    if (lines.isEmpty()) return null; // no debug info — nothing to measure

    int[] universe = lines.stream().mapToInt(Integer::intValue).toArray();
    int[] sl = new int[siteLines.size()];
    boolean[] ss = new boolean[siteLines.size()];
    for (int i = 0; i < sl.length; i++) { sl[i] = siteLines.get(i); ss[i] = siteSwitch.get(i); }
    final int classId = CoverageRecorder.register(
        className, source[0], lines.last(), universe, sl, ss);

    // ---- pass 2: inject probes ----
    // site indices are assigned by a single class-wide counter: both
    // passes visit methods in class-file order and jumps in bytecode
    // order, so the counter lines up with the pass-1 site list exactly.
    //
    // Probe placement must respect stack-map frames: a probe emitted
    // directly at the visitLineNumber event can land BETWEEN a branch
    // target's frame record and its offset (VerifyError: "expecting a
    // stackmap frame at branch target"). So probes are DEFERRED:
    //  - line probes flush immediately before the next real instruction
    //    (i.e. after any label + frame — correct: the probe belongs to
    //    the line's first instruction however control arrives there);
    //  - fallthrough probes flush before the next instruction, or
    //    BEFORE the next label if one arrives first (a label after a
    //    conditional jump is a join point — the probe must stay on the
    //    fallthrough-only path, ahead of the label).
    final int[] siteCounter = {0};
    ClassReader cr2 = new ClassReader(bytes);
    ClassWriter cw = new ClassWriter(cr2, ClassWriter.COMPUTE_MAXS);
    cr2.accept(new ClassVisitor(Opcodes.ASM9, cw) {
      @Override public MethodVisitor visitMethod(int acc, String n, String d,
          String sig, String[] ex) {
        MethodVisitor mv = super.visitMethod(acc, n, d, sig, ex);
        return new MethodVisitor(Opcodes.ASM9, mv) {
          private final java.util.ArrayList<Integer> pendingLines = new java.util.ArrayList<>();
          private int pendingFall = -1;

          private void probe(String method, int a, int b) {
            mv.visitLdcInsn(a);
            mv.visitLdcInsn(b);
            mv.visitMethodInsn(Opcodes.INVOKESTATIC, "graftcov/CoverageRecorder",
                method, "(II)V", false);
          }
          private void flushFall() {
            if (pendingFall >= 0) { probe("fall", classId, pendingFall); pendingFall = -1; }
          }
          private void flushAll() {
            flushFall();
            for (int i = 0; i < pendingLines.size(); i++)
              probe("hit", classId, pendingLines.get(i));
            pendingLines.clear();
          }

          @Override public void visitLineNumber(int line, Label start) {
            super.visitLineNumber(line, start);
            pendingLines.add(line);
          }
          @Override public void visitLabel(Label label) {
            flushFall(); // keep the fall probe on the fallthrough-only path
            super.visitLabel(label);
          }
          @Override public void visitFrame(int t, int nl, Object[] l, int ns, Object[] s) {
            super.visitFrame(t, nl, l, ns, s);
          }
          @Override public void visitJumpInsn(int opcode, Label label) {
            flushAll();
            if (opcode != Opcodes.GOTO && opcode != Opcodes.JSR) {
              int idx = siteCounter[0]++;
              probe("site", classId, idx);
              super.visitJumpInsn(opcode, label);
              pendingFall = idx;
            } else super.visitJumpInsn(opcode, label);
          }
          @Override public void visitTableSwitchInsn(int min, int max, Label dflt, Label... ls) {
            flushAll();
            probe("site", classId, siteCounter[0]++);
            super.visitTableSwitchInsn(min, max, dflt, ls);
          }
          @Override public void visitLookupSwitchInsn(Label dflt, int[] keys, Label[] ls) {
            flushAll();
            probe("site", classId, siteCounter[0]++);
            super.visitLookupSwitchInsn(dflt, keys, ls);
          }
          @Override public void visitInsn(int op) { flushAll(); super.visitInsn(op); }
          @Override public void visitIntInsn(int op, int v) { flushAll(); super.visitIntInsn(op, v); }
          @Override public void visitVarInsn(int op, int v) { flushAll(); super.visitVarInsn(op, v); }
          @Override public void visitTypeInsn(int op, String t) {
            // NEW is special: StackMapTable Uninitialized entries record
            // the NEW instruction's exact offset (via the label bound to
            // it) — a probe inserted between that label and the NEW
            // shifts the offset and fails class format checking. Flushing
            // AFTER the NEW is verifier-legal (probes never touch the
            // uninitialized ref on the stack).
            if (op == Opcodes.NEW) { super.visitTypeInsn(op, t); flushAll(); }
            else { flushAll(); super.visitTypeInsn(op, t); }
          }
          @Override public void visitFieldInsn(int op, String o, String n2, String d2) {
            flushAll(); super.visitFieldInsn(op, o, n2, d2);
          }
          @Override public void visitMethodInsn(int op, String o, String n2, String d2, boolean i) {
            flushAll(); super.visitMethodInsn(op, o, n2, d2, i);
          }
          @Override public void visitInvokeDynamicInsn(String n2, String d2,
              org.apache.xbean.asm9.Handle h, Object... a) {
            flushAll(); super.visitInvokeDynamicInsn(n2, d2, h, a);
          }
          @Override public void visitLdcInsn(Object v) { flushAll(); super.visitLdcInsn(v); }
          @Override public void visitIincInsn(int v, int inc) { flushAll(); super.visitIincInsn(v, inc); }
          @Override public void visitMultiANewArrayInsn(String d2, int dims) {
            flushAll(); super.visitMultiANewArrayInsn(d2, dims);
          }
        };
      }
    }, 0);
    return cw.toByteArray();
  }
}
