#!/usr/bin/env bash
# Installs the tracked pre-commit compile gate into the repo's hook dir.
# Uses git's own hook-path resolution, which handles linked worktrees
# (.git is a file there) and a configured core.hooksPath.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
HOOKS=$(git rev-parse --git-path hooks)
mkdir -p "$HOOKS"
cp tools/pre-commit "$HOOKS/pre-commit"
chmod +x "$HOOKS/pre-commit"
echo "pre-commit hook installed at $HOOKS/pre-commit"
