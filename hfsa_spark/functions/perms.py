"""Permission formatting (reference FsUtil.toString helpers,
/root/reference lib/.../util/FsUtil.java:73-86; csv rwx form pinned by
tool CsvExportTest.java:52-70).

These are sink/display helpers. ``mode_octal`` is also provided as a
Catalyst expression for columnar export.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mode_octal(mode: Column | str) -> Column:
    """16-bit mode → zero-padded 4-digit octal string ('%04o')."""
    c = F.col(mode) if isinstance(mode, str) else mode
    return F.lpad(F.conv(c.cast("string"), 10, 8), 4, "0")


def mode_octal_py(mode: int) -> str:
    return f"{mode & 0o7777:04o}"


def permission_triple(user: Column | str, group: Column | str, mode: Column | str) -> Column:
    """'user:group:0644' display form (FsUtil.java:79-86)."""
    u = F.col(user) if isinstance(user, str) else user
    g = F.col(group) if isinstance(group, str) else group
    return F.concat_ws(":", u, g, mode_octal(mode))


_RWX = ["---", "--x", "-w-", "-wx", "r--", "r-x", "rw-", "rwx"]


def mode_rwx_py(mode: int, sticky: bool = False) -> str:
    """'rwxr-xr-x' form (Hadoop FsPermission.toString; csv export)."""
    s = _RWX[(mode >> 6) & 7] + _RWX[(mode >> 3) & 7] + _RWX[mode & 7]
    if (mode >> 9) & 1:  # sticky bit: 't' when other-execute set, else 'T'
        s = s[:-1] + ("t" if mode & 1 else "T")
    return s


def mode_rwx(mode: Column | str) -> Column:
    """Catalyst expression for the rwx string (element_at over a literal
    lookup array, per permission digit — no UDF)."""
    c = F.col(mode) if isinstance(mode, str) else mode
    lut = F.array(*[F.lit(x) for x in _RWX])

    def digit(shift: int) -> Column:
        return F.element_at(lut, (F.shiftright(c, shift).bitwiseAND(F.lit(7)) + 1).cast("int"))

    base = F.concat(digit(6), digit(3), digit(0))
    sticky_char = F.when(c.bitwiseAND(F.lit(1)) == 1, F.lit("t")).otherwise(F.lit("T"))
    return F.when(
        F.shiftright(c, 9).bitwiseAND(F.lit(1)) == 1,
        F.concat(F.substring(base, 1, 8), sticky_char),
    ).otherwise(base)
