"""Host-side IO: FASTA/FASTQ/BAM readers feeding the device pipelines."""

from mgl_tpu.io.fasta import read_fasta, read_fastq  # noqa: F401
from mgl_tpu.io.bam import read_bam  # noqa: F401
