"""flf-tool driven purely by config: read -> compose-with-lm ->
prune-posterior -> confusion-network -> best -> evaluator chain, with
the LM built from the [lm] section (no programmatic context)."""

import textwrap

import pytest

from rasr_tpu.lattice.word_lattice import WordLattice


ARPA = textwrap.dedent("""\

    \\data\\
    ngram 1=5
    ngram 2=2

    \\1-grams:
    -0.60206\t<s>\t-0.30103
    -0.60206\t</s>
    -0.47712\ta\t-0.30103
    -0.47712\tb\t-0.30103
    -0.90309\tx\t-0.30103

    \\2-grams:
    -0.17609\ta b
    -0.30103\tb </s>

    \\end\\
""")


def write_slf(path, words_costs):
    """Linear two-alternative lattice: a->{b,x}->end."""
    lat = WordLattice(words={1: "a", 2: "b", 3: "x"})
    s0, s1, s2 = lat.add_state(0), lat.add_state(4), lat.add_state(8)
    lat.initial = s0
    lat.add_arc(s0, s1, 1, 1.0, 0.0)
    lat.add_arc(s1, s2, 2, 1.2, 0.0)   # 'b' slightly worse acoustically
    lat.add_arc(s1, s2, 3, 1.0, 0.0)   # 'x' better acoustically
    lat.set_final(s2)
    lat.write_htk_slf(str(path))


@pytest.fixture
def setup(tmp_path):
    (tmp_path / "corpus.xml").write_text(textwrap.dedent("""\
        <corpus name="c">
          <recording name="r" audio="x.wav">
            <segment name="s0" start="0" end="1"><orth>a b</orth></segment>
          </recording>
        </corpus>
    """))
    (tmp_path / "lm.arpa").write_text(ARPA)
    lats = tmp_path / "lats"
    lats.mkdir()
    write_slf(lats / "c_r_s0.slf", None)
    cfg = tmp_path / "flf.config"
    cfg.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml

        [*.lm]
        type = ARPA
        file = {tmp_path}/lm.arpa
        scale = 8.0

        [*.network]
        nodes = segment reader rescore prune cn best eval out

        [*.network.segment]
        type = speech-segment

        [*.network.reader]
        type = archive-reader
        links = segment
        path = {tmp_path}/lats

        [*.network.rescore]
        type = compose-with-lm
        links = reader
        scale = 1.0

        [*.network.prune]
        type = prune-posterior
        links = rescore
        threshold = 50

        [*.network.cn]
        type = confusion-network
        links = prune

        [*.network.best]
        type = best
        links = cn

        [*.network.eval]
        type = evaluator
        links = best
        lattice-evaluation = true

        [*.network.out]
        type = sink
        links = eval
    """))
    return tmp_path, cfg


class TestFlfToolConfigAlone:
    def test_chain_runs_from_config(self, setup, capsys):
        tmp, cfg = setup
        from rasr_tpu.tools.flf_tool import main
        rc = main([f"--config={cfg}"])
        out = capsys.readouterr().out
        assert rc == 0
        # acoustically 'a x' wins, but the 8x-scaled LM strongly prefers
        # 'a b' — the config-built ARPA LM must flip the decision
        assert "wer=0.00%" in out
        assert "lattice-wer=0.00%" in out
