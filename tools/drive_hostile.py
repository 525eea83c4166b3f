"""Hostile-config driver sweep: the drive_entry contract under a
deliberately awkward session — local[5] (odd core count) and 7 shuffle
partitions (prime, not a multiple of anything) — to prove results are
partition-count- and parallelism-invariant. Same compare as the
verify recipe; run from a directory other than /root/repo:

    cp tools/drive_hostile.py /tmp/ && cd /tmp && python drive_hostile.py [names...]
"""
import pathlib
import re
import runpy
import sys

SRC = pathlib.Path("/root/repo/.claude/skills/verify/drive_entry.py")
patched = re.sub(
    r'local\[8\]', "local[5]",
    SRC.read_text(),
)
patched = patched.replace(
    '"spark.sql.shuffle.partitions", "8"',
    '"spark.sql.shuffle.partitions", "7"',
)
target = pathlib.Path("/tmp/_drive_hostile_patched.py")
target.write_text(patched)
sys.argv = [str(target)] + sys.argv[1:]
runpy.run_path(str(target), run_name="__main__")
