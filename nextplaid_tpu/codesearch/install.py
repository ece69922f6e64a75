"""Agent integration installers.

Reference: colgrep/src/install/*.rs — installs a Claude Code plugin (skill +
hooks that steer Grep/Glob toward semantic search), plus OpenCode/Codex
variants. Here: writes a project-level skill file and prints the hook JSON
for the user's settings; nothing outside the target project is touched.
"""

from __future__ import annotations

import json
from pathlib import Path

SKILL_TEMPLATE = """---
name: cgrep
description: Semantic code search over this repository (ColBERT late-interaction + BM25 hybrid). Use instead of plain grep when searching by meaning, concept, or natural-language description rather than exact strings.
---

# cgrep — semantic code search

Search this repository by meaning:

```bash
{cgrep_cmd} "where is the retry logic" --path {project}
{cgrep_cmd} "function that validates auth tokens" --json --path {project}
{cgrep_cmd} -e "fn\\s+retry" "retry wrapper" --path {project}   # + regex filter
```

- Results are ranked by hybrid semantic+BM25 score with path/definition
  boosts; one hit per file.
- `--include/--exclude/--exclude-dir` filter paths; `-e REGEX` restricts to
  units whose code matches.
- The index updates incrementally on each search (`--no-update` to skip).
"""

HOOK_SNIPPET = {
    "hooks": {
        "PreToolUse": [
            {
                "matcher": "Grep",
                "hooks": [
                    {
                        "type": "command",
                        "command": (
                            "echo 'Consider cgrep for semantic/NL queries: "
                            "cgrep \"<your query>\"' >&2; exit 0"
                        ),
                    }
                ],
            }
        ]
    }
}


def install_claude_code(project: str, cgrep_cmd: str = "python -m nextplaid_tpu.codesearch.cli") -> Path:
    """Write the skill file into PROJECT/.claude/skills/cgrep/SKILL.md and
    return its path. The hook snippet is returned for manual merging (we
    never edit the user's settings.json)."""
    root = Path(project).resolve()
    skill_dir = root / ".claude" / "skills" / "cgrep"
    skill_dir.mkdir(parents=True, exist_ok=True)
    skill = skill_dir / "SKILL.md"
    skill.write_text(
        SKILL_TEMPLATE.format(cgrep_cmd=cgrep_cmd, project=root)
    )
    return skill


def hook_snippet_json() -> str:
    return json.dumps(HOOK_SNIPPET, indent=2)
