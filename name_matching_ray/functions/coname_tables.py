"""Legacy coname rewrite tables — DATA, not code.

These two tables ARE the behavioral specification of the legacy matcher's
normalization (reference coname.py:85-118); decision parity is impossible
without reproducing them verbatim, exactly as `assets.py` reproduces the
matcher.py rule tables (the adjudicated data-as-spec precedent).  Entry
ORDER is load-bearing: rules apply sequentially over the evolving string
(e.g. ('and','') runs before ('&','and'), so '&'->'and' SURVIVES abbr_adj
and is removed later by suffix_adj's 'and' entry instead).
"""

from __future__ import annotations

# --- legacy rewrite tables (coname.py:85-118; data = behavioral spec) -------

ABBR: list[tuple[str, str]] = [
    ('the', ''), ('and', ''), ('of', ''), ('for', ''), ('llc', 'llc'),
    ('Inc', 'incorp'), ('Incorporated', 'incorp'),
    ('CORP', 'incorp'), ('corporation', 'incorp'),
    ('corpor', 'incorp'), ('corporat', 'incorp'),
    ('corporate', 'incorp'), ('corporatin', 'incorp'),
    ('Assn', 'Association'), ('Assoc', 'Association'),
    ('intl', 'international'), ('gbl', 'global'),
    ('CO', 'Company'), ('LTD', 'Limited'),
    ('MOR', 'Mortgage'), ('Banc', 'BankCorp'),
    ('grp', 'group'), ('cap', 'capital'), ('FINL', 'financial'),
    ('THRU', 'Through'), ('COMM', 'Communication'), ('MGMT', 'Management'),
    ('INVT', 'investments'), ('INV', 'investments'),
    ('investment', 'investments'),
    ('PTNR', 'partner'), ('ADVR', 'advisors'), ('laboratory', 'laboratories'),
    ('tech', 'technologies'), ('technology', 'technologies'),
    ('INDS', 'industries'), ('industry', 'industries'),
    ('COMPANIES', 'Company'), ('Mort', 'Mortgage'), ('Thr', 'Through'),
    ('Sec', 'Securities'), ('BANCORPORATION', 'BankCorp'),
    ('RESOURCE', 'Resources'), ('Holding', 'Holdings'),
    ('Security', 'Securities'), ('ENTERPRISE', 'Enterprises'),
    ('funding', 'fundings'), ('system', 'systems'), ('chem', 'chemical'),
    ('SYS', 'systems'), ('MFG', 'manufacturing'), ('Prod', 'products'),
    ('Pharma', 'Pharm'), ('Pharmaceu', 'Pharm'), ('Pharmaceuti', 'Pharm'),
    ('Pharmace', 'Pharm'), ('Pharmaceut', 'Pharm'),
    ('Pharmaceutical', 'Pharm'),
    ('Product', 'products'), ('svcs', 'services'), ('service', 'services'),
    ('production', 'productions'),
    ('&', 'and'), ('L\\.P', 'LP'), ('L\\.L\\.P', 'LLP'), ('S\\.A', 'SA'),
    ('S\\.p\\.A', 'SPA'),
    ('u s a', 'usa'),
]

SUFFIX: list[str] = [
    'Incorporated', 'Corporation', 'LLC', 'Company', 'Limited', 'trust',
    'Company', 'Holdings', 'Holding', 'Group', 'enterprises',
    'international', 'and', 'gmbh',
]
