"""Shared DuckDB resource config for the oracle tools.

Two hazards this closes (round-15 advice):
  - a hard-coded memory_limit ('96GB') exceeding physical RAM lets the
    host OOM-killer SIGKILL the process before DuckDB ever spills — the
    limit must track the machine, so it is derived from MemAvailable
    (80%, floor 1 GB) unless GRAFT_DUCKDB_MEM overrides it;
  - a fixed spill path shared by concurrent oracle processes can
    collide/clobber — each process gets its own mkdtemp dir, removed
    at exit.
"""
import atexit
import os
import shutil
import tempfile


def _mem_limit():
    env = os.environ.get("GRAFT_DUCKDB_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    kb = int(line.split()[1])
                    gb = max(1, int(kb * 0.8 / 1024 / 1024))
                    return f"{gb}GB"
    except OSError:
        pass
    return "8GB"  # conservative fallback when /proc is unreadable


def configure(con):
    """Bound memory + give this process a private spill dir."""
    con.sql(f"SET memory_limit='{_mem_limit()}'")
    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.sql(f"SET temp_directory='{spill}'")
