"""Query AST, parser, exact DataFrame scorer, WAND kernel, collectors."""

from tantivy_spark.query.ast import (  # noqa: F401
    AllQuery,
    BooleanQuery,
    BoostQuery,
    ConstScoreQuery,
    DisjunctionMaxQuery,
    EmptyQuery,
    FuzzyTermQuery,
    Occur,
    PhraseQuery,
    Query,
    ExistsQuery,
    MoreLikeThisQuery,
    PhrasePrefixQuery,
    RegexQuery,
    TermQuery,
    TermRangeQuery,
    TermSetQuery,
)
