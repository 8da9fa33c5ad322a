"""`.fab` option-file round trip.

Capability parity with the reference binding's FabberRunData class
(py/fabber.py:314-460): a dict-like view of a `key=value` option file
that preserves comments and line order on save, so hand-maintained run
files survive programmatic edits.
"""

import os

from collections.abc import MutableMapping


class FabRunFile(MutableMapping):
    """Options for a run, loadable from / savable to a .fab file."""

    def __init__(self, filename=None):
        self.options = {}
        # ordered lines: option keys or comment/blank strings
        self.filelines = []
        self.filepath = None
        if filename:
            self.load(filename)

    # -- mapping protocol ---------------------------------------------------
    def __getitem__(self, key):
        return self.options[key.strip()]

    def __setitem__(self, key, value):
        key = key.strip()
        if not key:
            return
        if key not in self.options:
            self.filelines.append(key)
        self.options[key] = str(value).strip()

    def __delitem__(self, key):
        key = key.strip()
        if key in self.options:
            del self.options[key]
            self.filelines.remove(key)

    def __iter__(self):
        return iter(self.options)

    def __len__(self):
        return len(self.options)

    # -- comments -----------------------------------------------------------
    def add_comment(self, comment, option=None):
        idx = 0 if option is None else self.filelines.index(option)
        self.filelines.insert(idx, f"# {comment}")

    # -- file I/O -------------------------------------------------------------
    def load(self, filename):
        self.filepath = os.path.abspath(filename)
        with open(filename) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    self.filelines.append(line)
                else:
                    key, _, value = line.partition("=")
                    self.options[key.strip()] = value.strip()
                    self.filelines.append(key.strip())
        return self

    def save(self, filename=None, mask=None):
        filename = filename or self.filepath
        if not filename:
            raise RuntimeError("No file specified for save")
        with open(filename, "w") as f:
            self.dump(f, mask=mask)
        self.filepath = os.path.abspath(filename)

    def dump(self, stream, mask=None):
        for line in self.filelines:
            if not line or line.startswith("#"):
                stream.write(line)
            elif self.options.get(line, "") == "":
                stream.write(line)
            elif line == "mask" and mask is not None:
                stream.write(f"mask={mask}")
            else:
                stream.write(f"{line}={self.options[line]}")
            stream.write("\n")
