#!/bin/bash
# Build the graft coverage agent jar (tools/coverage/graft-coverage.jar).
# The ASM dependency is the shaded copy Spark ships (xbean-asm9-shaded);
# its classes are bundled into the agent jar so the agent is
# self-contained on any JVM.
set -euo pipefail
cd "$(dirname "$0")"
XBEAN=$(ls /opt/spark/jars/xbean-asm9-shaded-*.jar)
rm -rf build && mkdir -p build/classes
javac -encoding UTF-8 -cp "$XBEAN" -d build/classes src/graftcov/*.java
(cd build/classes && unzip -oq "$XBEAN" 'org/apache/xbean/asm9/*')
cat > build/MANIFEST.MF <<EOF
Premain-Class: graftcov.CoverageAgent
Can-Retransform-Classes: false
EOF
jar cfm graft-coverage.jar build/MANIFEST.MF -C build/classes .
echo "built $(pwd)/graft-coverage.jar"
