from graph4code_spark.analyzer import (
    analyze,
    analyze_joined,
    entity_required_tokens,
    good_match,
    must_terms,
)


def test_whitespace_and_delimiters():
    assert analyze("pandas.read_csv") == ["pandas", "read", "csv"]
    assert analyze("hello world") == ["hello", "world"]
    assert analyze("a  b\tc\nd") == ["a", "b", "c", "d"]


def test_case_change_splits():
    assert analyze("PowerShot") == ["power", "shot"]
    assert analyze("readCSV") == ["read", "csv"]
    assert analyze("CSVFile") == ["csv", "file"]
    assert analyze("DataFrame") == ["data", "frame"]


def test_numeric_splits():
    assert analyze("utf8") == ["utf", "8"]
    assert analyze("py3k") == ["py", "3", "k"]


def test_possessive_and_punct():
    assert analyze("O'Neil's") == ["o", "neil", "s"]
    assert analyze("<code>x=1</code>") == ["code", "x", "1", "code"]


def test_entity_required_tokens():
    req = entity_required_tokens("sklearn.svm.SVC")
    assert req == frozenset({"sklearn", "svm", "svc"})
    req = entity_required_tokens("sklearn.svm.SVC", "fit")
    assert req == frozenset({"sklearn", "svm", "svc", "fit"})
    assert entity_required_tokens("pandas.read_csv") == frozenset(
        {"pandas", "read", "csv"}
    )


def test_must_terms():
    assert must_terms("sklearn.svm.SVC") == ["SVC", "sklearn"]
    assert must_terms("fit") == ["fit"]


def test_good_match():
    # raw lowercase containment
    assert good_match("using sklearn.svm.svc here", "sklearn.svm.SVC")
    # analyzer-token form: SVC -> 'svc'
    assert good_match("the svc class from sklearn", "sklearn.svm.SVC")
    # missing first component -> bad
    assert not good_match("just call svc somewhere", "sklearn.svm.SVC")
    # DataFrame -> token form 'data frame'
    assert analyze_joined("DataFrame") == "data frame"
    assert good_match("a data frame from pandas", "pandas.DataFrame")
