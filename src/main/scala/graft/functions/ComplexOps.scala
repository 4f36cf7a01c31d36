package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex-number kernels over `struct<re: double, im: double>` columns
  * (SURVEY §3: the reference's complex types, types/complex.py, carried
  * as a struct since Spark has no complex physical type). All pure
  * Column arithmetic — codegen'd, engine-deterministic. */
object ComplexOps {

  def complex(re: Column, im: Column): Column =
    struct(re.cast("double").as("re"), im.cast("double").as("im"))

  def re(z: Column): Column = z.getField("re")
  def im(z: Column): Column = z.getField("im")

  def add(a: Column, b: Column): Column = complex(re(a) + re(b), im(a) + im(b))
  def sub(a: Column, b: Column): Column = complex(re(a) - re(b), im(a) - im(b))

  def mul(a: Column, b: Column): Column = complex(
    re(a) * re(b) - im(a) * im(b),
    re(a) * im(b) + im(a) * re(b))

  def div(a: Column, b: Column): Column = {
    val d = re(b) * re(b) + im(b) * im(b)
    complex((re(a) * re(b) + im(a) * im(b)) / d,
      (im(a) * re(b) - re(a) * im(b)) / d)
  }

  def conj(z: Column): Column = complex(re(z), -im(z))
  def modulus(z: Column): Column = sqrt(re(z) * re(z) + im(z) * im(z))
  def arg(z: Column): Column = atan2(im(z), re(z))
}
