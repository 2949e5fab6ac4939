"""The reviewable statement stream — the reference's core UX.

Every generator in the reference returns an ordered table of SQL text rows
grouped into commented sections (warnings first), which a human reviews and
then executes (/root/reference/mysql_to_exasol.sql:352-368, README.md:38-41).
We preserve that exactly: a MigrationPlan is an ordered list of sections,
renderable as a DataFrame[ord, sql_text] or executed step by step — dry-run
by default everywhere, like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Statement:
    sql_text: str
    kind: str = "sql"  # sql | comment | warning
    # optional executable payload (a Spark action) for our engine's own steps
    action: object | None = None


@dataclass
class Section:
    title: str
    statements: list[Statement] = field(default_factory=list)


@dataclass
class MigrationPlan:
    """Ordered sections of statements. Warnings sort first (the reference
    puts its warning rows at the top of the stream —
    mysql_to_exasol.sql:353)."""

    sections: list[Section] = field(default_factory=list)

    def add_section(self, title: str) -> Section:
        s = Section(title)
        self.sections.append(s)
        return s

    def warnings(self) -> list[str]:
        return [
            st.sql_text
            for sec in self.sections
            for st in sec.statements
            if st.kind == "warning"
        ]

    def rows(self) -> list[tuple[int, str]]:
        out: list[tuple[int, str]] = []
        ord_ = 1
        warn = self.warnings()
        if warn:
            out.append((ord_, "-- ============ WARNINGS ============"))
            ord_ += 1
            for w in warn:
                out.append((ord_, f"-- {w}"))
                ord_ += 1
        for sec in self.sections:
            out.append((ord_, f"-- ============ {sec.title} ============"))
            ord_ += 1
            for st in sec.statements:
                if st.kind == "warning":
                    continue
                text = f"-- {st.sql_text}" if st.kind == "comment" else st.sql_text
                out.append((ord_, text))
                ord_ += 1
        return out

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Render as DataFrame[ord, sql_text] ordered by ord — the same
        shape the reference's scripts RETURN (RETURNS TABLE)."""
        return spark.createDataFrame(self.rows(), "ord INT, sql_text STRING").orderBy("ord")

    def to_sql(self) -> str:
        return "\n".join(text for _, text in self.rows())
