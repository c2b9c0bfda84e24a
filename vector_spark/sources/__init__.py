from vector_spark.sources.synth import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    ensure_transcripts_file,
    gen_transcripts_pdf,
    sf_name,
    transcripts_df,
    tool_lookup_df,
    tool_lookup_rows,
)
