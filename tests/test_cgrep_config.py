"""cgrep persisted config, settings CLI, and AGENTS.md agent installers
(reference colgrep/src/config.rs, commands/config.rs, install/*.rs)."""

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from nextplaid_tpu.codesearch.config import CgrepConfig, config_path
from nextplaid_tpu.codesearch.install import (
    MARKER_BEGIN,
    install_agents_md,
    uninstall_agents_md,
)


@pytest.fixture(autouse=True)
def cfg_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("CGREP_CONFIG_DIR", str(tmp_path / "cfg"))
    monkeypatch.delenv("CGREP_MODEL", raising=False)
    return tmp_path


def test_config_roundtrip(cfg_dir):
    cfg = CgrepConfig()
    cfg.default_model = "/models/colbert"
    cfg.default_k = 25
    cfg.hybrid_alpha = 0.6
    cfg.verbose = True
    cfg.extra_ignore = ["*.gen.go", "vendor/**"]
    p = cfg.save()
    assert p == config_path()
    got = CgrepConfig.load()
    assert got.default_model == "/models/colbert"
    assert got.default_k == 25
    assert got.hybrid_alpha == 0.6
    assert got.verbose is True
    assert got.extra_ignore == ["*.gen.go", "vendor/**"]
    # TOML on disk is stdlib-parseable (tomllib read it back already) and
    # quotes strings.
    text = p.read_text()
    assert 'default_model = "/models/colbert"' in text


def test_config_set_value_types():
    cfg = CgrepConfig()
    cfg.set_value("default_k", "15")
    cfg.set_value("hybrid_search", "off")
    cfg.set_value("force_include", "a.py, b.py")
    assert cfg.default_k == 15
    assert cfg.hybrid_search is False
    assert cfg.force_include == ["a.py", "b.py"]
    with pytest.raises(ValueError):
        cfg.set_value("hybrid_alpha", "1.5")
    with pytest.raises(ValueError):
        cfg.set_value("verbose", "maybe")
    with pytest.raises(KeyError):
        cfg.set_value("parallel_sessions", "4")  # ONNX knob: intentionally absent
    cfg.unset("default_k")
    assert cfg.default_k is None


def test_corrupt_config_returns_defaults(cfg_dir):
    p = config_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("not [valid toml ===")
    assert CgrepConfig.load() == CgrepConfig()


def test_settings_cli(cfg_dir):
    from nextplaid_tpu.codesearch.cli import cli

    r = CliRunner().invoke(
        cli, ["settings", "--set", "default_k", "7", "--set",
              "hybrid_alpha", "0.5"], obj={},
    )
    assert r.exit_code == 0, r.output
    shown = json.loads(r.output.rsplit("#", 1)[0])
    assert shown["default_k"] == 7
    assert shown["hybrid_alpha"] == 0.5
    # Persisted.
    assert CgrepConfig.load().default_k == 7
    # Unknown key -> clean error.
    r = CliRunner().invoke(
        cli, ["settings", "--set", "bogus", "1"], obj={}
    )
    assert r.exit_code != 0
    assert "unknown setting" in r.output


def test_set_model_cli(cfg_dir, tmp_path):
    from nextplaid_tpu.codesearch.cli import cli

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    r = CliRunner().invoke(cli, ["set-model", str(model_dir)], obj={})
    assert r.exit_code == 0, r.output
    assert CgrepConfig.load().default_model == str(model_dir.resolve())
    r = CliRunner().invoke(cli, ["set-model", str(tmp_path / "nope")], obj={})
    assert r.exit_code != 0


def test_self_update_offline_message():
    from nextplaid_tpu.codesearch.cli import cli

    r = CliRunner().invoke(cli, ["update"], obj={})
    assert r.exit_code != 0
    assert "network" in r.output


def test_agents_md_install_idempotent(tmp_path):
    p1 = install_agents_md("codex", base=tmp_path)
    assert p1 == tmp_path / ".codex" / "AGENTS.md"
    first = p1.read_text()
    assert first.count(MARKER_BEGIN) == 1
    # Reinstall does not duplicate.
    install_agents_md("codex", base=tmp_path)
    assert p1.read_text().count(MARKER_BEGIN) == 1
    # User content is preserved around the section.
    p1.write_text("# my own notes\n\n" + p1.read_text())
    install_agents_md("codex", base=tmp_path)
    content = p1.read_text()
    assert content.startswith("# my own notes")
    assert content.count(MARKER_BEGIN) == 1


def test_agents_md_uninstall(tmp_path):
    p = install_agents_md("hermes", base=tmp_path)
    assert uninstall_agents_md("hermes", base=tmp_path) is True
    assert not p.exists()  # nothing else in the file -> removed
    # With user content: only the section goes.
    p2 = install_agents_md("opencode", base=tmp_path)
    p2.write_text(p2.read_text() + "\n# keep me\n")
    assert uninstall_agents_md("opencode", base=tmp_path) is True
    assert "keep me" in p2.read_text()
    assert MARKER_BEGIN not in p2.read_text()
    assert uninstall_agents_md("opencode", base=tmp_path) is False


def test_opencode_path_is_xdg(tmp_path):
    p = install_agents_md("opencode", base=tmp_path)
    assert p == tmp_path / ".config" / "opencode" / "AGENTS.md"


def test_strip_section_stray_end_marker(tmp_path):
    """A stray END marker before BEGIN (hand-edited file) must not hang or
    grow the file; an unterminated BEGIN truncates to it."""
    from nextplaid_tpu.codesearch.install import (
        MARKER_END,
        _strip_section,
        install_agents_md,
    )

    p = install_agents_md("codex", base=tmp_path)
    content = p.read_text()
    # END before BEGIN:
    mangled = MARKER_END + "\n" + content
    out = _strip_section(mangled)
    assert MARKER_BEGIN not in out
    # Unterminated BEGIN:
    out2 = _strip_section("keep me\n" + MARKER_BEGIN + "\nrest without end")
    assert out2 == "keep me\n"


def test_command_name_query_escape_hatch():
    """`cgrep update` is the subcommand; `cgrep -- update` is a literal
    search (advisor finding: natural-language queries shadowed by the new
    command names need a documented escape hatch)."""
    from nextplaid_tpu.codesearch.cli import cli

    r = CliRunner().invoke(cli, ["--", "update"], obj={})
    # The literal search path runs (and fails for want of a model) instead
    # of the self-update command.
    assert "self-update" not in r.output
    assert "No encoder model" in r.output, r.output
