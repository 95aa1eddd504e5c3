"""Drop-in TPU-worker job running the full-recipe rehearsal
(see .claude/skills/verify/SKILL.md): cp this file to /tmp/tpu_jobs/NNN.py.

The worker execs jobs in-process, so reload the package modules if you
edited them since the worker started — or, simpler, stop the worker
(`touch /tmp/tpu_jobs/STOP`) and run tools/rehearsal.py standalone.
"""

import tools.rehearsal as r

r.main(["--workdir", "/tmp/ssl_cr_rehearsal", "--out", "/root/repo/REHEARSAL.json"])
