package graft.simd;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Panama (jdk.incubator.vector) distance kernels — the SIMD lanes the
 * reference uses in Distances.java:48-64. Float-lane accumulation with
 * FMA, exactly like the reference; this makes them recall-equivalent but
 * NOT bit-identical to the scalar double-accumulation kernels in
 * graft.core.Distances, so they are OPT-IN (-Dgraft.simd=1): the
 * oracle-gated default path stays scalar-deterministic.
 *
 * Plain float[]/int signatures on purpose: Scala callers typecheck
 * without resolving the incubator module, and a JVM launched without
 * --add-modules=jdk.incubator.vector fails only inside the availability
 * probe (caught, falls back to scalar).
 */
public final class SimdKernels {
  private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

  private SimdKernels() {}

  public static double l2Squared(float[] a, float[] b) {
    return l2SquaredRange(a, 0, b, 0, a.length);
  }

  public static double l2SquaredRange(float[] a, int aOff, float[] b, int bOff, int len) {
    int i = 0;
    FloatVector acc = FloatVector.zero(S);
    int upper = S.loopBound(len);
    for (; i < upper; i += S.length()) {
      FloatVector va = FloatVector.fromArray(S, a, aOff + i);
      FloatVector vb = FloatVector.fromArray(S, b, bOff + i);
      FloatVector d = va.sub(vb);
      acc = d.fma(d, acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) {
      float d = a[aOff + i] - b[bOff + i];
      s += d * d;
    }
    return s;
  }

  public static double dot(float[] a, float[] b) {
    int i = 0;
    int len = a.length;
    FloatVector acc = FloatVector.zero(S);
    int upper = S.loopBound(len);
    for (; i < upper; i += S.length()) {
      FloatVector va = FloatVector.fromArray(S, a, i);
      FloatVector vb = FloatVector.fromArray(S, b, i);
      acc = va.fma(vb, acc);
    }
    float s = acc.reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) s += a[i] * b[i];
    return s;
  }

  public static double norm(float[] a) {
    return Math.sqrt(dot(a, a));
  }
}
