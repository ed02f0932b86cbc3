"""``python -m margipose_tpu.bin`` — the margipose CLI (see run.sh)."""

from margipose_tpu.bin import main

main()
