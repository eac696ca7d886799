def rafterydiag(*a, **k):
    raise NotImplementedError
