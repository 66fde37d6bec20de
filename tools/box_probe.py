#!/usr/bin/env python3
"""Cheap box-phase probe: 8-vs-32 thread scaling ceilings of THIS box,
right now, without spinning up a JVM.

Two probes, mirroring graft.Bench.cpuCeiling():
  cpu — per-worker sha256 over /dev/zero (register/ALU-bound, streams
        nothing through DRAM beyond the 64-byte block buffer);
  mem — per-worker sequential scan of a shared 512 MB byte buffer, one
        touch per 64-byte cache line (aggregate-DRAM-bandwidth-bound).

Efficiency = (aggregate throughput at 32) / (aggregate at 8) / 4, ideal 1.0.
Fire a bench campaign only when cpu ≥ 0.9 AND mem is as high as this box
gets (observed healthy ≈0.85+; degraded phases sit 0.45-0.75).

Usage: python3 tools/box_probe.py [reps]   (default 1)
Prints one line per rep: cpu=<e> mem=<e>
"""
import mmap
import os
import subprocess
import sys
import time


def run_workers(nt: int, cmd: list[str]) -> float:
    t0 = time.time()
    ps = [subprocess.Popen(cmd, stdout=subprocess.DEVNULL) for _ in range(nt)]
    for p in ps:
        p.wait()
    return nt / (time.time() - t0)  # work-units/sec


def cpu_probe() -> float:
    cmd = ["bash", "-c", "head -c 150M /dev/zero | sha256sum"]
    run_workers(8, cmd)  # warm
    e8 = run_workers(8, cmd)
    e32 = run_workers(32, cmd)
    return e32 / e8 / 4.0


MEM_FILE = "/dev/shm/box_probe_512m"


def mem_probe() -> float:
    if not os.path.exists(MEM_FILE) or os.path.getsize(MEM_FILE) != 512 << 20:
        with open(MEM_FILE, "wb") as f:
            f.write(os.urandom(1 << 20) * 512)
    # each worker mmaps the SHARED file and strides cache lines — python
    # slicing overhead is identical at both levels so it cancels in the ratio
    worker = (
        "import mmap,sys\n"
        "f=open('%s','rb')\n"
        "m=mmap.mmap(f.fileno(),0,prot=mmap.PROT_READ)\n"
        "s=0\n"
        "for i in range(0,len(m),64): s+=m[i]\n"
        "sys.exit(0)" % MEM_FILE
    )
    cmd = [sys.executable, "-c", worker]
    run_workers(8, cmd)  # page in + warm
    e8 = run_workers(8, cmd)
    e32 = run_workers(32, cmd)
    return e32 / e8 / 4.0


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for _ in range(reps):
        print(f"cpu={cpu_probe():.3f} mem={mem_probe():.3f}", flush=True)
