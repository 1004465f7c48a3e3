#!/bin/sh
# Stage the persistent XLA compile cache into git.
#
# The environment rebuild between sessions recreates /root/repo from git,
# dropping every gitignored file — including .jax_comp_cache, whose entries
# cost 2-8 MINUTES each to recompile over the tunneled TPU (the small-bench
# LSQR while-loop alone measured 433 s on 2026-08-20). Committing the cache
# binaries is ugly but saves each new session tens of minutes of dead time.
#
# Usage: sh scripts/commit_compile_cache.sh   (then git commit)
set -e
cd "$(dirname "$0")/.."
du -sh .jax_comp_cache
git add -f .jax_comp_cache
git status --short -- .jax_comp_cache | head
