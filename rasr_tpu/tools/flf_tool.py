"""flf-tool: run Flf lattice-processing networks over a corpus
(reference src/Tools/Flf/FlfTool.cc).

Config: [*.corpus] file=...; [*.network] nodes = a b c;
[*.network.<name>] type=... links=...
"""

from __future__ import annotations

import sys

from ..bliss.corpus import CorpusDescription
from ..core.application import Application
from ..flf.processor import FlfNetwork


class FlfToolApp(Application):
    def __init__(self, argv=None, context=None):
        super().__init__("flf-tool", argv)
        self._context = context or {}

    def run(self) -> int:
        corpus = CorpusDescription(self.config.sub("corpus"))
        network = FlfNetwork(self.config, context=self._context)
        n = network.run(corpus)
        self.log("processed %d segments", n)
        return 0


def main(argv=None, context=None) -> int:
    return FlfToolApp(argv, context=context).main()


if __name__ == "__main__":
    sys.exit(main())
