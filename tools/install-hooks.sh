#!/usr/bin/env bash
# Installs the tracked pre-commit compile gate into .git/hooks.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
cp tools/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
