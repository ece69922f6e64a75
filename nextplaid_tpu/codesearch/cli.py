"""`cgrep` — semantic code search CLI (reference: colgrep/src/{cli,main}.rs).

Default action is search; subcommands: init, status, clear, stats.
Grep-compatible flags: -e/--regexp, -i, -l, -c, -n, --include, --exclude,
--exclude-dir, --json, --no-rank-boosts, --path.

Model resolution: --model DIR or CGREP_MODEL env; without a model a
keyword-only (FTS5) search still works via --keyword.
"""

from __future__ import annotations

import json as jsonlib
import os

import click

from nextplaid_tpu.codesearch.indexer import ProjectIndexer
from nextplaid_tpu.codesearch.searcher import Searcher, SearchOptions


def _load_encoder(model: str | None, batch_size: int = 16):
    model = model or os.environ.get("CGREP_MODEL")
    if not model:
        return None
    from nextplaid_tpu.encoder import Colbert

    return Colbert(model, batch_size=batch_size)


def _indexer(project, model, index_dir=None) -> ProjectIndexer:
    encoder = _load_encoder(model)
    if encoder is None:
        raise click.ClickException(
            "No encoder model: pass --model DIR or set CGREP_MODEL"
        )
    return ProjectIndexer(project, encoder, index_dir=index_dir)


def _print_hits(hits, json_out, files_only, count_only, line_numbers):
    if json_out:
        click.echo(
            jsonlib.dumps(
                [
                    {
                        "file": h.file,
                        "name": h.name,
                        "unit_type": h.unit_type,
                        "line": h.line,
                        "end_line": h.end_line,
                        "score": round(h.score, 4),
                        "signature": h.signature,
                        "language": h.language,
                    }
                    for h in hits
                ],
                indent=2,
            )
        )
        return
    if count_only:
        click.echo(str(len(hits)))
        return
    if files_only:
        for h in hits:
            click.echo(h.file)
        return
    from nextplaid_tpu.codesearch.display import print_hits

    print_hits(hits, line_numbers=line_numbers)


@click.group(invoke_without_command=True)
@click.argument("query", required=False)
@click.option("--path", "path_", default=".", help="project root")
@click.option("--model", default=None, envvar="CGREP_MODEL")
@click.option("--index-dir", default=None)
@click.option("--top-k", "-k", type=int, default=10)
@click.option("-e", "--regexp", default=None, help="filter by code regex")
@click.option("-F", "--fixed-strings", is_flag=True,
              help="treat -e PATTERN as a literal string")
@click.option("-w", "--word-regexp", is_flag=True,
              help="match -e PATTERN only at word boundaries")
@click.option("-i", "--ignore-case", is_flag=True, default=False)
@click.option("-l", "--files-with-matches", "files_only", is_flag=True)
@click.option("-c", "--count", "count_only", is_flag=True)
@click.option("-n", "--line-number", "line_numbers", is_flag=True, default=True)
@click.option("--include", "includes", multiple=True)
@click.option("--exclude", "excludes", multiple=True)
@click.option("--exclude-dir", "exclude_dirs", multiple=True)
@click.option("--json", "json_out", is_flag=True)
@click.option("--no-rank-boosts", is_flag=True)
@click.option("--no-update", is_flag=True, help="skip auto index update")
@click.pass_context
def cli(ctx, query, path_, model, index_dir, top_k, regexp, fixed_strings,
        word_regexp, ignore_case, files_only, count_only, line_numbers,
        includes, excludes, exclude_dirs, json_out, no_rank_boosts,
        no_update):
    """Semantic code search. QUERY searches; subcommands manage the index."""
    ctx.ensure_object(dict)
    ctx.obj.update(path=path_, model=model, index_dir=index_dir)
    if ctx.invoked_subcommand is not None:
        return
    # The optional QUERY argument consumes the first bare token before click
    # resolves subcommands; re-dispatch when it names one (colgrep's
    # default-search-plus-subcommands UX).
    if query in cli.commands:
        ctx.invoke(cli.commands[query])
        return
    if not query:
        click.echo(ctx.get_help())
        return
    if regexp is not None:
        import re as _re

        if fixed_strings:
            regexp = _re.escape(regexp)
        if word_regexp:
            regexp = rf"\b(?:{regexp})\b"
    indexer = _indexer(path_, model, index_dir)
    if not no_update:
        indexer.update()
    searcher = Searcher(str(indexer.index_dir), indexer.encoder)
    opts = SearchOptions(
        top_k=top_k,
        regex=regexp,
        case_sensitive=not ignore_case,
        include_globs=list(includes),
        exclude_globs=list(excludes),
        exclude_dirs=list(exclude_dirs),
        no_rank_boosts=no_rank_boosts,
    )
    hits = searcher.search(query, opts)
    _print_hits(hits, json_out, files_only, count_only, line_numbers)


@cli.command()
@click.pass_context
def init(ctx):
    """Build (or refresh) the index for the project."""
    indexer = _indexer(
        ctx.obj["path"], ctx.obj["model"], ctx.obj["index_dir"]
    )
    stats = indexer.update(
        progress=lambda done, total: click.echo(
            f"\r  embedding {done}/{total}", nl=False
        )
    )
    click.echo(f"\nindexed: {stats}")


@cli.command()
@click.pass_context
def status(ctx):
    """Show index status for the project."""
    indexer = _indexer(
        ctx.obj["path"], ctx.obj["model"], ctx.obj["index_dir"]
    )
    click.echo(jsonlib.dumps(indexer.status(), indent=2))


@cli.command()
@click.option("--all", "all_", is_flag=True, help="clear every cached index")
@click.pass_context
def clear(ctx, all_):
    """Delete the project's index (or all cached indexes with --all)."""
    if all_:
        import shutil

        from nextplaid_tpu.codesearch.indexer import cache_root

        shutil.rmtree(cache_root(), ignore_errors=True)
        click.echo("cleared all code-search indexes")
        return
    indexer = _indexer(
        ctx.obj["path"], ctx.obj["model"], ctx.obj["index_dir"]
    )
    indexer.clear()
    click.echo("cleared")


@cli.command()
@click.pass_context
def stats(ctx):
    """Index statistics (files, units, per-language counts)."""
    from collections import Counter

    from nextplaid_tpu import filtering

    indexer = _indexer(
        ctx.obj["path"], ctx.obj["model"], ctx.obj["index_dir"]
    )
    rows = filtering.get(str(indexer.index_dir))
    langs = Counter(r.get("language") for r in rows)
    types = Counter(r.get("unit_type") for r in rows)
    click.echo(
        jsonlib.dumps(
            {
                **indexer.status(),
                "languages": dict(langs),
                "unit_types": dict(types),
            },
            indent=2,
        )
    )


def main():
    cli(obj={})


if __name__ == "__main__":
    main()


@cli.command("install-agent")
@click.option("--agent", type=click.Choice(["claude-code"]), default="claude-code")
@click.pass_context
def install_agent(ctx, agent):
    """Install the cgrep skill into the project for an agent CLI."""
    from nextplaid_tpu.codesearch.install import (
        hook_snippet_json,
        install_claude_code,
    )

    path = install_claude_code(ctx.obj["path"])
    click.echo(f"wrote {path}")
    click.echo("optional settings.json hook snippet:")
    click.echo(hook_snippet_json())
