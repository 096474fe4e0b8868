from .fasta import read_fasta, read_file_list  # noqa: F401
from .prescan import cal_size  # noqa: F401
