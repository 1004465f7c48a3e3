#!/bin/sh
# Stage the persistent XLA compile cache into git.
#
# The environment rebuild between sessions recreates /root/repo from git,
# dropping every gitignored file — including .jax_comp_cache, whose entries
# cost 2-8 MINUTES each to recompile over the tunneled TPU (the small-bench
# LSQR while-loop alone measured 433 s on 2026-08-20). Committing the cache
# binaries is ugly but saves each new session tens of minutes of dead time.
#
# Entries are keyed to the exact jaxlib/XLA build: after an env rebuild
# with a DIFFERENT JAX version the inherited blobs are dead weight. To keep
# history from accumulating stale blobs, this script:
#   - drops tracked entries that no longer exist on disk (pruned/stale),
#   - refuses to stage more than MAX_MB (override: MAX_MB=500 sh ...).
#
# Usage: sh scripts/commit_compile_cache.sh   (then git commit)
set -e
cd "$(dirname "$0")/.."
MAX_MB="${MAX_MB:-200}"

# Prune tracked entries that were removed on disk.
git ls-files .jax_comp_cache | while read -r f; do
  [ -e "$f" ] || git rm -q --cached "$f"
done

size_mb=$(du -sm .jax_comp_cache | cut -f1)
echo "cache size: ${size_mb} MB (limit ${MAX_MB} MB)"
if [ "$size_mb" -gt "$MAX_MB" ]; then
  echo "ERROR: .jax_comp_cache is ${size_mb} MB > ${MAX_MB} MB — prune old" \
       "entries (ls -t .jax_comp_cache | tail) or raise MAX_MB." >&2
  exit 1
fi
git add -f .jax_comp_cache
git status --short -- .jax_comp_cache | head
