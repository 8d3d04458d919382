#!/bin/bash
# ONE closing command (r16, VERDICT r15 #7): run the round's closing bench and its
# prior-snapshot control BACK-TO-BACK in the same window, so the committed pairing is
# adjacent BY CONSTRUCTION. The r15 committed pairing was 2 hours stale, on a day when
# two control runs of IDENTICAL code differed 33% — adjacency is the only thing that
# makes the ratio attributable to code rather than machine drift. Both window start
# times are stamped into BENCH_full_rNN.json's control block and the standalone
# BENCH_control_rNN.json so the adjacency is auditable, not asserted.
#
# Usage: tools/bench_closing.sh <prior-commit-ish> [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
COMMIT="${1:?usage: tools/bench_closing.sh <prior-commit-ish> [sfDir]}"
SFDIR="${2:-/root/testdata/sf0.1}"

sbt -batch compile >/dev/null 2>&1 || { echo "[closing] HEAD compile FAILED" >&2; exit 1; }

T0=$(date -u +%FT%TZ)
echo "[closing] HEAD closing bench starting at $T0 on $SFDIR" >&2
SPARK_GRAFT_SF_DIR="$SFDIR" \
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx24g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  graft.Bench >/dev/null

T1=$(date -u +%FT%TZ)
echo "[closing] control ($COMMIT) starting at $T1 — adjacent by construction" >&2
tools/bench_control.sh "$COMMIT" "$SFDIR"

python3 - "$T0" "$T1" <<'PY'
import glob, json, re, sys
t0, t1 = sys.argv[1], sys.argv[2]
target = max((p for p in glob.glob("BENCH_full_r*.json")
              if re.search(r"_r(\d+)\.json$", p)),
             key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
for path in (target, target.replace("BENCH_full_", "BENCH_control_")):
    d = json.load(open(path))
    blk = d.get("control", d)  # both artifacts carry a "control" block
    blk["closing_started_utc"] = t0
    blk["control_started_utc"] = t1
    json.dump(d, open(path, "w"))
print(f"[closing] stamped closing={t0} control={t1} into {target} and its control artifact")
PY
