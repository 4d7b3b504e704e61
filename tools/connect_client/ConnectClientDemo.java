import org.apache.spark.sql.connect.SparkSession;
import org.apache.spark.sql.Row;
import java.util.List;

public class ConnectClientDemo {
  public static void main(String[] args) throws Exception {
    SparkSession spark = (SparkSession) SparkSession.builder()
        .remote("sc://localhost:15002").getOrCreate();
    List<Row> r1 = spark.sql("select 1 + 1 as two").collectAsList();
    System.out.println("basic: " + r1);
    List<Row> r2 = spark.sql(
        "select float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) as dot").collectAsList();
    System.out.println("graft float_dot: " + r2);
    long n = spark.read().parquet("/root/testdata/sf0.001/nation.parquet").count();
    System.out.println("nation rows: " + n);
    spark.stop();
  }
}
