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
#   - if over MAX_MB (override: MAX_MB=500 sh ...), PRUNES oldest-mtime
#     entries from disk+index until under the limit, then stages the rest.
#     (Entries written this session are newest and survive; checkout-time
#     entries share one mtime and are pruned in arbitrary order among
#     themselves — acceptable: a wrongly pruned hot entry just recompiles
#     once.) The round-3 behavior (exit 1 when over limit) silently
#     stopped persistence — never refuse, always stage something.
#
# Usage: sh scripts/commit_compile_cache.sh   (then git commit)
set -e
cd "$(dirname "$0")/.."
MAX_MB="${MAX_MB:-240}"

# Prune tracked entries that were removed on disk.
git ls-files .jax_comp_cache | while read -r f; do
  [ -e "$f" ] || git rm -q --cached "$f"
done

size_mb=$(du -sm .jax_comp_cache | cut -f1)
echo "cache size: ${size_mb} MB (limit ${MAX_MB} MB)"
if [ "$size_mb" -gt "$MAX_MB" ]; then
  echo "over limit: pruning oldest entries until under ${MAX_MB} MB"
  # Oldest mtime first; prune until the total is under the limit.
  ls -tr .jax_comp_cache | while read -r f; do
    size_mb=$(du -sm .jax_comp_cache | cut -f1)
    [ "$size_mb" -le "$MAX_MB" ] && break
    echo "  prune: $f ($(du -m ".jax_comp_cache/$f" | cut -f1) MB)"
    rm -f ".jax_comp_cache/$f"
    git rm -q --cached --ignore-unmatch ".jax_comp_cache/$f"
  done
  echo "cache size after prune: $(du -sm .jax_comp_cache | cut -f1) MB"
fi
git add -f .jax_comp_cache
git status --short -- .jax_comp_cache | head
