#!/usr/bin/env python3
"""Scale-capture wrapper around local_verify.py.

Usage: python3 tools/scale_verify.py <sfDir> <verifyOutDir> <correctnessJson>

Runs the full local_verify sweep (EXT oracles on), then re-runs each
failing query ALONE in a fresh process — the documented DuckDB
buffer-pool accumulation (a 150-oracle single-process sweep can OOM
the q74/q77 graph unrolls at sf1 after ~110 prior oracles; they pass
clean in a fresh process) — and merges the per-query records into one
driver-format correctness JSON. A query is recorded as failing only
if it fails in its OWN fresh process.
"""
import json, os, subprocess, sys, tempfile

sf, out, dst = sys.argv[1], sys.argv[2], sys.argv[3]
env = dict(os.environ, GRAFT_VERIFY_EXT="1")


def sweep(names=None, tag="full"):
    fd, path = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    cmd = [sys.executable, "tools/local_verify.py", sf, out]
    if names:
        cmd.append(",".join(names))
    e = dict(env, GRAFT_VERIFY_JSON=path)
    r = subprocess.run(cmd, env=e, capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith(("ORACLE-ERR", "EXT-ERR", "VALUE-MISMATCH",
                            "ROWCOUNT", "SCHEMA", "==", "!!")):
            print(f"[{tag}] {line}")
    try:
        recs = json.load(open(path))
    finally:
        os.unlink(path)
    return recs


records = sweep()
fails = sorted(k for k, v in records.items() if not v["hash_match"]
               and v.get("err") != "rows-only (no oracle)")
print(f"\nfull sweep: {len(fails)} fail -> fresh-process reruns: {fails}")
for name in fails:
    rerun = sweep([name], tag=name)
    records[name] = rerun[name]
final_fail = sorted(k for k, v in records.items() if not v["hash_match"]
                    and v.get("err") != "rows-only (no oracle)")
with open(dst, "w") as f:
    json.dump(records, f, indent=1)
n_pass = sum(1 for v in records.values() if v["hash_match"])
print(f"\nwrote {dst}: {n_pass}/{len(records)} hash-pass, "
      f"final fails: {final_fail or 'none'}")
sys.exit(1 if final_fail else 0)
